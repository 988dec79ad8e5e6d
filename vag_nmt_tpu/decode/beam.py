"""Fully on-device batched beam search (SURVEY.md C12, §3.2).

The reference's beam loop keeps hypothesis bookkeeping in host Python with a
device<->host sync every step — its single biggest perf defect. Here the whole
search is one `lax.while_loop` with fixed (batch, beam) shapes:

- encode ONCE; beams of a sentence SHARE the encoder context — attention
  broadcasts over a separate beam axis instead of tiling ctx/ctx_proj to
  batch*beam rows, so the encoder state streams from HBM once per sentence
  per step, not once per beam (K-fold less decode-loop bandwidth);
- each step: one decoder step over all live rows, top-k over the (beam*vocab)
  candidate grid, and on-device gathers of state/history by beam index;
- finished hypotheses emit <pad> at log-prob 0 so they ride along frozen and
  keep competing in top-k at their final score;
- the loop exits early when every hypothesis in the batch is finished;
- final ranking divides by length**alpha (alpha=1.0 default [LOW-CONF — the
  reference's normalization formula is unverified, mount empty this session]).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp

from vag_nmt_tpu.core.config import EOS_ID, ModelConfig, PAD_ID, SOS_ID
from vag_nmt_tpu.models.model import DecodeState, decode_step_topk
from vag_nmt_tpu.ops.pallas_readout_topk import deferred_exactness_active

NEG_INF = -1e9


class BeamResult(NamedTuple):
    tokens: jnp.ndarray        # (B, K, L) int32, <pad>-padded, best beam first
    lengths: jnp.ndarray       # (B, K) int32, incl. <eos> when produced
    scores: jnp.ndarray        # (B, K) fp32 length-normalized scores, descending
    best_tokens: jnp.ndarray   # (B, L)
    best_lengths: jnp.ndarray  # (B,)


def beam_search(
    params: Dict[str, Any],
    cfg: ModelConfig,
    state: DecodeState,
    *,
    beam_size: int,
    max_len: int,
    length_norm_alpha: float = 1.0,
    unroll: int = 0,
    tables=None,
) -> BeamResult:
    """tables: optional per-vocab gate/readout tables
    (models.decoder.decode_tables) — loop-invariant, computed once per
    decode dispatch; turns the per-step embed->matmul chains into gathers.

    unroll: decoder steps per while_loop iteration (0 -> env
    VAG_BEAM_UNROLL, default 1). U>1 amortizes per-iteration loop overhead
    (the all-finished reduction + scalar sync) over U steps at the cost of
    up to U-1 wasted post-finish steps per chunk. Hypotheses/lengths/scores
    are IDENTICAL for any U (finished rows are frozen; tested) — only the
    realized trip count changes. The token buffer pads max_len up to a U
    multiple and is sliced back."""
    import os

    env_u = os.environ.get("VAG_BEAM_UNROLL", "")
    if env_u:                       # env wins for A/B experiments
        unroll = int(env_u)
    if unroll <= 0:
        unroll = 1
    U = min(unroll, max_len)
    max_len_pad = -(-max_len // U) * U
    B = state.s0.shape[0]
    K = beam_size

    def cond(carry):
        t, finished = carry[0], carry[5]
        return (t < max_len_pad) & ~jnp.all(finished)

    V = cfg.tgt_vocab_size
    # Chunk-level deferred exactness (opt-in; see deferred_exactness_active
    # for the measured NEGATIVE result that keeps it off by default): the
    # slot-depth<K kernel's per-step exactness lax.cond costs ~17 us/step
    # in context; in "defer" mode the watermark flag rides the loop carry
    # instead and the WHOLE chunk reruns with the exact depth-K kernel iff
    # it ever fired. Results are exact either way.
    defer = deferred_exactness_active(K)

    def make_body(mode):                 # "plain" | "defer" | "exact"
        def body_1(carry):
            t, last_tok, s, scores, tokens, finished, lengths = carry[:7]
            # Steps past max_len exist only inside a partially-finished
            # unroll block; freezing every row there makes them exact
            # no-ops, so scores/lengths of never-finishing rows match the
            # U=1 results.
            finished = finished | (t >= max_len)
            # Fused decoder-step + candidate-scoring + top-k: finished rows
            # are forced to continue with <pad> at log-prob 0 (they ride
            # along frozen and keep competing), live rows score
            # scores + log-softmax. On TPU the vocab projection runs INSIDE
            # the streaming top-k kernel (ops/pallas_readout_topk) so the
            # (B*K, V) logits never reach HBM; elsewhere logits materialize
            # and beam_topk handles scoring (env VAG_READOUT_TOPK /
            # VAG_TOPK_IMPL override — see the module docs for measured
            # comparisons).
            if mode == "defer":
                s_new, top_scores, idx, v = decode_step_topk(
                    params, cfg, last_tok, s, state, scores, finished,
                    tables=tables, defer_exact=True)
            else:
                s_new, top_scores, idx = decode_step_topk(
                    params, cfg, last_tok, s, state, scores, finished,
                    tables=tables, exact=(mode == "exact"))
            beam_idx = idx // V
            tok = (idx % V).astype(jnp.int32)

            def sel(x):  # gather (B, K, ...) along beam axis
                return jnp.take_along_axis(
                    x, beam_idx.reshape(
                        beam_idx.shape + (1,) * (x.ndim - 2)), axis=1)

            s_sel = sel(s_new)
            tokens = sel(tokens)
            fin_sel = sel(finished[..., None])[..., 0]
            len_sel = sel(lengths[..., None])[..., 0]

            tokens = tokens.at[:, :, t].set(tok)   # finished rows wrote PAD
            lengths = jnp.where(fin_sel, len_sel, len_sel + 1)
            finished = fin_sel | (tok == EOS_ID)
            out = (t + 1, tok, s_sel, top_scores, tokens, finished, lengths)
            if mode == "defer":
                out = out + (carry[7] | v,)
            return out

        if U > 1:
            def body(carry):
                for _ in range(U):
                    carry = body_1(carry)
                return carry
            return body
        return body_1

    init = (
        jnp.asarray(0, jnp.int32),
        jnp.full((B, K), SOS_ID, jnp.int32),
        jnp.broadcast_to(state.s0[:, None, :],
                         (B, K, state.s0.shape[-1])),
        # Beam 0 active, others at -inf so identical initial beams don't
        # flood the first top-k with duplicates.
        jnp.tile(jnp.asarray([0.0] + [NEG_INF] * (K - 1), jnp.float32), (B, 1)),
        jnp.full((B, K, max_len_pad), PAD_ID, jnp.int32),
        jnp.zeros((B, K), bool),
        jnp.zeros((B, K), jnp.int32),
    )
    if defer:
        out = jax.lax.while_loop(cond, make_body("defer"),
                                 init + (jnp.zeros((), bool),))

        def rerun(_):
            r = jax.lax.while_loop(cond, make_body("exact"), init)
            return r[3], r[4], r[6]

        def keep(_):
            return out[3], out[4], out[6]

        scores, tokens, lengths = jax.lax.cond(out[7], rerun, keep, None)
    else:
        _, _, _, scores, tokens, _, lengths = jax.lax.while_loop(
            cond, make_body("plain"), init)
    tokens = tokens[:, :, :max_len]

    norm = jnp.maximum(lengths, 1).astype(jnp.float32) ** length_norm_alpha
    final_scores = scores / norm
    order = jnp.argsort(-final_scores, axis=1)
    tokens = jnp.take_along_axis(tokens, order[..., None], axis=1)
    lengths = jnp.take_along_axis(lengths, order, axis=1)
    final_scores = jnp.take_along_axis(final_scores, order, axis=1)
    return BeamResult(
        tokens=tokens,
        lengths=lengths,
        scores=final_scores,
        best_tokens=tokens[:, 0],
        best_lengths=lengths[:, 0],
    )
