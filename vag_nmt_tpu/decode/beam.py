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


def _make_body_1(params, cfg, state: DecodeState, tables, mode: str,
                 max_len: int, eos_top: bool = False, row_cap=None):
    """The per-step beam body over the 7-tuple carry
    (t, last_tok (B,K), s (B,K,H), scores (B,K), tokens (B,K,L),
    finished (B,K), lengths (B,K)) — shared by `beam_search`'s while_loop
    and the two-phase resume loops (every sentence's bookkeeping is
    row-local, so the same body is exact regardless of which chunk a row
    rides in). mode: "plain" | "defer" | "exact" (see beam_search).
    eos_top: the "eos_top" termination semantic (core.config
    DecodeConfig.beam_finish) — the moment a sentence's top-RANKED beam
    holds a finished hypothesis, every beam of that sentence freezes, so
    the while_loop's all-finished exit fires within one step of each
    sentence's best hypothesis finishing instead of waiting for all K.
    row_cap: optional (B,) int32 per-row step cap (source-relative length
    limit, core.config DecodeConfig.max_len_factor) — row i's beams freeze
    at t >= row_cap[i] exactly as they do at max_len. Per-row, so results
    stay independent of chunk packing."""
    V = cfg.tgt_vocab_size

    def body_1(carry):
        t, last_tok, s, scores, tokens, finished, lengths = carry[:7]
        # Steps past max_len exist only inside a partially-finished
        # unroll block; freezing every row there makes them exact
        # no-ops, so scores/lengths of never-finishing rows match the
        # U=1 results.
        finished = finished | (t >= max_len)
        if row_cap is not None:
            finished = finished | (t >= row_cap[:, None])
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
        if eos_top:
            # top_scores are descending, so beam slot 0 is the current best
            # hypothesis: once it is finished, freeze the whole sentence.
            finished = finished | finished[:, :1]
        out = (t + 1, tok, s_sel, top_scores, tokens, finished, lengths)
        if mode == "defer":
            out = out + (carry[7] | v,)
        return out

    return body_1


def _beam_init(state: DecodeState, K: int, buf_len: int):
    """Initial 7-tuple carry for a beam search over state's B sentences."""
    B = state.s0.shape[0]
    return (
        jnp.asarray(0, jnp.int32),
        jnp.full((B, K), SOS_ID, jnp.int32),
        jnp.broadcast_to(state.s0[:, None, :], (B, K, state.s0.shape[-1])),
        # Beam 0 active, others at -inf so identical initial beams don't
        # flood the first top-k with duplicates.
        jnp.tile(jnp.asarray([0.0] + [NEG_INF] * (K - 1), jnp.float32),
                 (B, 1)),
        jnp.full((B, K, buf_len), PAD_ID, jnp.int32),
        jnp.zeros((B, K), bool),
        jnp.zeros((B, K), jnp.int32),
    )


def _finalize(tokens, lengths, scores, max_len: int,
              length_norm_alpha: float, finished=None) -> BeamResult:
    """Length-normalize, rank beams best-first, slice the token buffer.

    finished: pass the loop-end (B, K) finished flags under the "eos_top"
    termination semantic — beams still unfinished when their sentence's top
    hypothesis froze are masked out of the ranking (a sentence with NO
    finished beam, i.e. max_len hit with no <eos> anywhere, falls back to
    ranking its truncated hypotheses as usual)."""
    tokens = tokens[:, :, :max_len]
    norm = jnp.maximum(lengths, 1).astype(jnp.float32) ** length_norm_alpha
    final_scores = scores / norm
    if finished is not None:
        any_fin = jnp.any(finished, axis=1, keepdims=True)
        final_scores = jnp.where(finished | ~any_fin, final_scores, NEG_INF)
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
    beam_finish: str = "all_frozen",
    row_cap=None,
) -> BeamResult:
    """row_cap: optional (B,) int32 per-row step cap (see _make_body_1).

    beam_finish: termination semantic ("all_frozen" | "eos_top"; see
    core.config DecodeConfig.beam_finish). Under "eos_top" a sentence stops
    within one step of its top-ranked hypothesis finishing, and beams still
    unfinished at that point are masked out of the final ranking.

    tables: optional per-vocab gate/readout tables
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

    # Chunk-level deferred exactness (opt-in; see deferred_exactness_active
    # for the measured NEGATIVE result that keeps it off by default): the
    # slot-depth<K kernel's per-step exactness lax.cond costs ~17 us/step
    # in context; in "defer" mode the watermark flag rides the loop carry
    # instead and the WHOLE chunk reruns with the exact depth-K kernel iff
    # it ever fired. Results are exact either way.
    defer = deferred_exactness_active(K)

    if beam_finish not in ("all_frozen", "eos_top"):
        raise ValueError(f"unknown beam_finish {beam_finish!r}")
    eos_top = beam_finish == "eos_top"

    def make_body(mode):                 # "plain" | "defer" | "exact"
        body_1 = _make_body_1(params, cfg, state, tables, mode, max_len,
                              eos_top=eos_top, row_cap=row_cap)
        if U > 1:
            def body(carry):
                for _ in range(U):
                    carry = body_1(carry)
                return carry
            return body
        return body_1

    init = _beam_init(state, K, max_len_pad)
    if defer:
        out = jax.lax.while_loop(cond, make_body("defer"),
                                 init + (jnp.zeros((), bool),))

        def rerun(_):
            r = jax.lax.while_loop(cond, make_body("exact"), init)
            return r[3], r[4], r[5], r[6]

        def keep(_):
            return out[3], out[4], out[5], out[6]

        scores, tokens, finished, lengths = jax.lax.cond(
            out[7], rerun, keep, None)
    else:
        _, _, _, scores, tokens, finished, lengths = jax.lax.while_loop(
            cond, make_body("plain"), init)
    return _finalize(tokens, lengths, scores, max_len, length_norm_alpha,
                     finished=finished if eos_top else None)


def beam_search_two_phase(
    params: Dict[str, Any],
    cfg: ModelConfig,
    state: DecodeState,
    *,
    beam_size: int,
    max_len: int,
    chunk: int,
    split_len: int,
    length_norm_alpha: float = 1.0,
    tables=None,
    beam_finish: str = "all_frozen",
    row_cap=None,
) -> tuple:
    """Two-phase straggler-compacted beam search over N = S*chunk sentences.

    The fixed-shape chunked decode pays each chunk's while_loop until its
    SLOWEST row finishes — in the long-caption regime (IKEA, max_len=128)
    measured per-chunk trips were 119–123 while the MEAN hypothesis length
    was 23.7: every 128-row chunk contains a straggler, so ~80% of all beam
    steps processed rows that were already finished. This search splits the
    work at `split_len` (L1):

      phase 1: each of the S chunks runs its own early-exit while_loop for
               at most L1 steps (a chunk whose rows all finish earlier still
               exits early, so short homogeneous chunks are unaffected);
      then, for each rung of a DOUBLING LADDER L1 -> 2*L1 -> ... -> max_len:
      compact: sentences are re-packed ON DEVICE with a stable argsort on
               the per-sentence finished flag — stragglers first, current
               order preserved within each class;
      resume:  a while_loop over straggler chunks resumes the beam loop from
               the previous rung's cap to this rung's, visiting only
               ceil(n_unfinished / chunk) chunks — it exits as soon as the
               next chunk contains no unfinished sentence.

    Why a ladder instead of one straggler pass: a sentence is "unfinished"
    until ALL K of its beams freeze, and a small tail of rows (weak beams
    that keep outscoring their frozen siblings) runs to max_len. One
    compaction spreads those never-finishers across every straggler chunk,
    pinning each at max_len (measured on the IKEA exercise: phase-2 trips
    = chunks x (max_len - L1) exactly). Re-compacting at each doubling cap
    clumps the shrinking tail into ever-fewer chunks, so each rung pays its
    full cap only where a tail row actually rides.

    EXACT by construction: the per-step body is row-local (`_make_body_1`),
    every unfinished row leaves rung r at exactly its cap (a chunk holding
    any unfinished row cannot exit before the cap), and finished rows are
    frozen no-ops wherever they ride — so resuming the identical carry in
    any chunk packing reproduces the single-loop result bit for bit
    (parity-tested).

    Runs mode="plain" bodies (the per-step exactness cond); the opt-in
    chunk-level deferred-exactness knob does not compose with re-packing
    and is ignored here.

    Returns (BeamResult over the flat N rows, phase1_steps (S,) int32
    realized trips per chunk, phase2_steps () int32 total resume trips over
    all ladder rungs) — both step counts feed the MFU/roofline accounting
    (each trip costs one `chunk`-row decoder step in either phase)."""
    N = state.s0.shape[0]
    B = chunk
    if N % B:
        raise ValueError(f"two-phase decode needs N ({N}) % chunk ({B}) == 0")
    S = N // B
    K = beam_size
    L1 = min(max(int(split_len), 1), max_len)
    rungs = []                           # doubling caps, ending at max_len
    cap = L1
    while cap < max_len:
        cap = min(cap * 2, max_len)
        rungs.append(cap)

    if beam_finish not in ("all_frozen", "eos_top"):
        raise ValueError(f"unknown beam_finish {beam_finish!r}")
    eos_top = beam_finish == "eos_top"

    def body_of(st, rc=None):
        return _make_body_1(params, cfg, st, tables, "plain", max_len,
                            eos_top=eos_top, row_cap=rc)

    # ---- phase 1: per-chunk early-exit loops capped at L1 ----------------
    state_chunks = jax.tree.map(
        lambda a: a.reshape((S, B) + a.shape[1:]), state)
    cap_chunks = (None if row_cap is None
                  else row_cap.reshape(S, B))

    def phase1(args):
        st, rc = args

        def cond(c):
            return (c[0] < L1) & ~jnp.all(c[5])

        return jax.lax.while_loop(cond, body_of(st, rc),
                                  _beam_init(st, K, max_len))

    carries = jax.lax.map(phase1, (state_chunks, cap_chunks))
    steps1 = carries[0]                                       # (S,) exit t

    def flat(a):  # (S, B, ...) -> (N, ...)
        return a.reshape((N,) + a.shape[2:])

    packed = tuple(flat(a) for a in carries[1:])
    ctx_p, proj_p, mask_p = state.ctx, state.ctx_proj, state.src_mask
    cap_p = row_cap
    order = jnp.arange(N, dtype=jnp.int32)    # packed row -> original row
    steps2 = jnp.asarray(0, jnp.int32)
    t_start = L1

    for t_end in rungs:
        # ---- compact: stragglers first (stable argsort) -------------------
        fin_sent = jnp.all(packed[4], axis=1)                 # (N,)
        perm = jnp.argsort(fin_sent.astype(jnp.int32), stable=True)
        n_unfin = (N - jnp.sum(fin_sent)).astype(jnp.int32)

        def take(a, perm=perm):
            return jnp.take(a, perm, axis=0)

        ctx_p, proj_p, mask_p = take(ctx_p), take(proj_p), take(mask_p)
        cap_p = None if cap_p is None else take(cap_p)
        order = take(order)
        packed = tuple(take(a) for a in packed)

        # ---- resume straggler chunks from t_start to t_end ----------------
        def outer_cond(c, n_unfin=n_unfin):
            i = c[0]
            return (i < S) & (i * B < n_unfin)

        def outer_body(c, ctx_p=ctx_p, proj_p=proj_p, mask_p=mask_p,
                       cap_p=cap_p, t_start=t_start, t_end=t_end):
            i, p2 = c[0], c[1]
            arrs = c[2:]

            def sl(a):
                return jax.lax.dynamic_slice_in_dim(a, i * B, B, axis=0)

            st = DecodeState(ctx=sl(ctx_p), ctx_proj=sl(proj_p),
                             src_mask=sl(mask_p),
                             s0=jnp.zeros((B, arrs[1].shape[-1]),
                                          arrs[1].dtype))
            rc = None if cap_p is None else sl(cap_p)
            init = (jnp.asarray(t_start, jnp.int32),) + tuple(
                sl(a) for a in arrs)

            def cond(cc):
                return (cc[0] < t_end) & ~jnp.all(cc[5])

            out = jax.lax.while_loop(cond, body_of(st, rc), init)
            upd = tuple(
                jax.lax.dynamic_update_slice_in_dim(a, v, i * B, axis=0)
                for a, v in zip(arrs, out[1:]))
            return (i + 1, p2 + out[0] - t_start) + upd

        fin = jax.lax.while_loop(
            outer_cond, outer_body,
            (jnp.asarray(0, jnp.int32), steps2) + packed)
        steps2 = fin[1]
        packed = fin[2:]
        t_start = t_end

    _, _, scores, tokens, finished, lengths = packed

    # ---- scatter back to the original row order + finalize ---------------
    inv = jnp.argsort(order)
    scores, tokens, finished, lengths = (jnp.take(scores, inv, axis=0),
                                         jnp.take(tokens, inv, axis=0),
                                         jnp.take(finished, inv, axis=0),
                                         jnp.take(lengths, inv, axis=0))
    return (_finalize(tokens, lengths, scores, max_len, length_norm_alpha,
                      finished=finished if eos_top else None),
            steps1.astype(jnp.int32), steps2)
