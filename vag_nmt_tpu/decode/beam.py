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


def ngram_ban(tokens, t_col, n: int, V: int):
    """Per-step no-repeat n-gram ban list (fairseq/Paulus-2017 semantics).

    tokens: (B, K, L) token buffer (K=1 for greedy); t_col: scalar or (B, 1)
    int32 current decode position(s); n: the n-gram order (> 1); V: vocab
    size, used as the "no ban" sentinel (scatters of V are dropped).
    Returns (B, K, L) int32 banned token ids — each entry is the token that
    would complete an n-gram already present in that beam's own hypothesis,
    or the sentinel V. The (n-1)-token suffix ending at the row's current
    position is compared against every fully-past window (one shifted
    equality per suffix position, vectorized over (B, K, L)); each matching
    window's NEXT token is banned. Shared by the beam bodies and
    greedy_decode (review finding r4: greedy silently ignored the knob)."""
    nm1 = n - 1
    B, K, L = tokens.shape
    t_b = jnp.broadcast_to(jnp.asarray(t_col, jnp.int32)
                           .reshape(-1, 1), (B, 1))
    # -1 tail padding never equals a real token id, so windows
    # reaching past L cannot match.
    padded = jnp.concatenate(
        [tokens, jnp.full((B, K, nm1), -1, tokens.dtype)], axis=-1)
    match = jnp.ones((B, K, L), bool)
    for j in range(nm1):
        # suffix token at absolute position t - (n-1) + j
        idx = jnp.clip(t_b + (j - nm1), 0, L - 1)      # (B, 1)
        last_j = jnp.take_along_axis(
            tokens, jnp.broadcast_to(idx[:, :, None], (B, K, 1)),
            axis=2)[..., 0]                            # (B, K)
        match = match & (padded[:, :, j:j + L]
                         == last_j[:, :, None])
    # window [i, i+n-1] must lie fully in the decoded past
    valid = (jnp.arange(L, dtype=jnp.int32)[None, :]
             <= t_b - n)[:, None, :]                   # (B, 1, L)
    return jnp.where(match & valid,
                     padded[:, :, nm1:nm1 + L].astype(jnp.int32),
                     V)


def _make_body_1(params, cfg, state: DecodeState, tables, mode: str,
                 max_len: int, eos_top: bool = False, row_cap=None,
                 prune_alpha=None, block_ngram: int = 0):
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
    stay independent of chunk packing.

    The carry's t may be a scalar (all rows in step, the chunked loops) or
    a (B,) int32 vector of PER-ROW decode positions (the streaming-refill
    loop, where each working slot is at its own step): the same row-local
    arithmetic applies — freezing compares per row, and the token write
    lands at each row's own position via a one-hot mask over the length
    axis instead of a shared index.

    prune_alpha: when not None, EXACT ADMISSIBLE BEAM PRUNING is active
    with length-norm exponent alpha (VERDICT r3 item 1; the cure for the
    IKEA "wanderer" pinning, where under "all_frozen" one live
    repetition-loop beam keeps a sentence decoding to max_len because
    top-k must always fill K slots from m<K frozen candidates + live
    expansions, so some live expansion survives every step regardless of
    score). A live beam at raw score r (cumulative log-prob, <= 0) can
    only DECREASE r, and its final normalized score r_fin/len_fin**alpha
    is maximized by padding zero-cost tokens to the row's step cap:
    bound = r / cap**alpha (alpha >= 0, len_fin <= cap). When EVERY live
    beam of a sentence has bound strictly below the sentence's WORST
    frozen hypothesis's normalized score, all its live beams freeze at
    once and the sentence exits. EXACTNESS (proof, checked in
    test_decode.test_beam_prune_*): bound < min frozen-normalized implies
    r < f_i * (cap/len_i)**alpha <= f_i for every frozen slot i (f_i <= 0,
    cap >= len_i), i.e. every live beam — hence every candidate it can
    ever produce — scores strictly below every frozen slot's riding
    score, so in the unpruned continuation (a) no frozen slot is ever
    evicted from top-k, and (b) every later-finished or truncated
    hypothesis ranks strictly below every currently-frozen one in the
    final normalized ranking. The final ranked hypotheses down to the
    last frozen slot (in particular best_tokens/best_lengths and every
    EOS-complete hypothesis) are therefore bit-identical with pruning on
    or off; only the content of the pruned (provably-losing, incomplete)
    tail slots differs — truncated at the prune step instead of at cap.

    block_ngram: when n > 0, NO-REPEAT N-GRAM BLOCKING is active
    (fairseq/Paulus-2017 semantics; core.config DecodeConfig.block_ngram —
    a SEMANTIC knob, outputs change by design): a candidate token is
    banned when appending it would complete an n-gram already present in
    that beam's own hypothesis. Computed per step from the token buffer
    itself by `ngram_ban` above. The ban list (sentinel V = no ban,
    dropped by scatter) rides to decode_step_topk — into the streaming
    readout->top-k kernel as a dense vocab mask on the fused path (r4;
    blocking previously forced the whole unfused pipeline), or as an
    -inf logits scatter on the unfused path. Live
    rows only by construction: finished rows' candidates never come from
    logits (beam_topk rides them on <pad>), and a live row's filled
    prefix never contains <pad>/<eos>, so specials are never banned."""
    V = cfg.tgt_vocab_size

    def body_1(carry):
        t, last_tok, s, scores, tokens, finished, lengths = carry[:7]
        t_col = t if jnp.ndim(t) == 0 else t[:, None]       # (B,1) when vec
        ban = None
        if block_ngram > 0:
            ban = ngram_ban(tokens, t_col, block_ngram, V)
        # Steps past max_len exist only inside a partially-finished
        # unroll block; freezing every row there makes them exact
        # no-ops, so scores/lengths of never-finishing rows match the
        # U=1 results.
        finished = finished | (t_col >= max_len)
        if row_cap is not None:
            finished = finished | (t_col >= row_cap[:, None])
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
                tables=tables, defer_exact=True, ban=ban)
        else:
            s_new, top_scores, idx = decode_step_topk(
                params, cfg, last_tok, s, state, scores, finished,
                tables=tables, exact=(mode == "exact"), ban=ban)
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

        if jnp.ndim(t) == 0:
            tokens = tokens.at[:, :, t].set(tok)   # finished rows wrote PAD
        else:
            # per-row positions: one-hot write over the length axis. Rows
            # whose t has run past the buffer match no lane and write
            # nothing (they are frozen; a clamped write would let their
            # PAD overwrite the last real token of a max_len hypothesis).
            L = tokens.shape[-1]
            hit = (jax.lax.broadcasted_iota(jnp.int32, (1, 1, L), 2)
                   == t[:, None, None])
            tokens = jnp.where(hit, tok[:, :, None], tokens)
        lengths = jnp.where(fin_sel, len_sel, len_sel + 1)
        finished = fin_sel | (tok == EOS_ID)
        if eos_top:
            # top_scores are descending, so beam slot 0 is the current best
            # hypothesis: once it is finished, freeze the whole sentence.
            finished = finished | finished[:, :1]
        if prune_alpha is not None:
            # Exact admissible pruning (see factory docstring). All in
            # fp32 (B, K) elementwise + row reductions — negligible next
            # to the decoder step. Strict < everywhere: ties are never
            # pruned, so argsort tie-breaking cannot diverge.
            a = prune_alpha
            fnorm = top_scores / jnp.maximum(
                lengths, 1).astype(jnp.float32) ** a
            inf = jnp.asarray(jnp.inf, jnp.float32)
            frozen_norm_min = jnp.min(
                jnp.where(finished, fnorm, inf), axis=1, keepdims=True)
            any_frozen = jnp.any(finished, axis=1, keepdims=True)
            if row_cap is None:
                capf = jnp.asarray(max_len, jnp.float32)
            else:
                capf = jnp.minimum(row_cap, max_len).astype(
                    jnp.float32)[:, None]
            bound = top_scores / capf ** a
            ok = finished | (bound < frozen_norm_min)
            finished = finished | (any_frozen
                                   & jnp.all(ok, axis=1, keepdims=True))
        out = (t + 1, tok, s_sel, top_scores, tokens, finished, lengths)
        if mode == "defer":
            out = out + (carry[7] | v,)
        return out

    return body_1


def _resolve_prune(prune: bool, length_norm_alpha: float):
    """Resolve the admissible-pruning knob to a prune_alpha for
    _make_body_1: env VAG_BEAM_PRUNE=on/off wins over the `prune` argument
    (A/B convention shared with the other decode knobs), and alpha < 0
    disables unconditionally — the bound r/cap**alpha is only admissible
    for alpha >= 0 (negative alpha rewards SHORT hypotheses, where a live
    beam's best future is to stop immediately, not to pad to cap)."""
    import os

    env = os.environ.get("VAG_BEAM_PRUNE", "")
    if env in ("on", "1"):
        prune = True
    elif env in ("off", "0"):
        prune = False
    if not prune or length_norm_alpha < 0:
        return None
    return float(length_norm_alpha)


def _resolve_block(block_ngram: int) -> int:
    """Env VAG_BLOCK_NGRAM=N wins over the argument (A/B convention shared
    with the other decode knobs); n <= 1 disables (a 1-gram ban would
    forbid every previously-used token)."""
    import os

    env = os.environ.get("VAG_BLOCK_NGRAM", "")
    if env:
        block_ngram = int(env)
    return block_ngram if block_ngram > 1 else 0


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
              length_norm_alpha: float,
              mask_incomplete: bool = False) -> BeamResult:
    """Length-normalize, rank beams best-first, slice the token buffer.

    mask_incomplete (the "eos_top" termination semantic): beams whose
    hypothesis was truncated by the sentence freeze (or by max_len /
    row_cap) are masked out of the ranking. Completion is derived from the
    token buffer itself — a hypothesis is complete iff its last counted
    token is <eos> — NOT from the loop's finished flags: the eos_top freeze
    ORs the whole sentence's flags True, which would otherwise let a
    truncated live beam outrank the finished hypothesis under length
    normalization (found in review; regression-tested). A sentence with NO
    complete beam (max_len hit with no <eos> anywhere) falls back to
    ranking its truncated hypotheses as usual."""
    tokens = tokens[:, :, :max_len]
    norm = jnp.maximum(lengths, 1).astype(jnp.float32) ** length_norm_alpha
    final_scores = scores / norm
    if mask_incomplete:
        last = jnp.take_along_axis(
            tokens, jnp.maximum(lengths - 1, 0)[..., None], axis=2)[..., 0]
        completed = (lengths > 0) & (last == EOS_ID)
        any_c = jnp.any(completed, axis=1, keepdims=True)
        final_scores = jnp.where(completed | ~any_c, final_scores, NEG_INF)
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
    prune: bool = True,
    block_ngram: int = 0,
) -> BeamResult:
    """row_cap: optional (B,) int32 per-row step cap (see _make_body_1).

    block_ngram: no-repeat n-gram blocking (SEMANTIC; see _make_body_1's
    docstring and core.config DecodeConfig.block_ngram). 0 disables. Env
    VAG_BLOCK_NGRAM=N overrides for A/B.

    prune: exact admissible beam pruning (default ON; see _make_body_1's
    docstring for the bound and the exactness proof). Env VAG_BEAM_PRUNE=
    on/off overrides for A/B. Auto-disabled when length_norm_alpha < 0
    (the bound's direction assumes alpha >= 0). Changes ONLY the content
    of tail hypotheses that provably rank below every completed one; all
    completed hypotheses, their ranking, and best_tokens are bit-identical
    with pruning on or off.

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
    prune_alpha = _resolve_prune(prune, length_norm_alpha)
    block_n = _resolve_block(block_ngram)
    U = min(unroll, max_len)
    max_len_pad = -(-max_len // U) * U
    B = state.s0.shape[0]
    K = beam_size

    def cond(carry):
        t, finished = carry[0], carry[5]
        return (t < max_len_pad) & ~jnp.all(finished)

    # Chunk-level deferred exactness (TPU default when the fused kernel
    # runs at slot depth < K; VAG_FRT_DEFER=0 restores the per-step cond —
    # see deferred_exactness_active for the measurement history): the
    # slot-depth<K kernel's per-step exactness lax.cond costs ~11-17
    # us/step in context; in "defer" mode the watermark flag rides the
    # loop carry instead and the WHOLE chunk reruns with the exact depth-K
    # kernel iff a LIVE row ever fired it. Results are exact either way.
    defer = deferred_exactness_active(K)

    if beam_finish not in ("all_frozen", "eos_top"):
        raise ValueError(f"unknown beam_finish {beam_finish!r}")
    eos_top = beam_finish == "eos_top"

    def make_body(mode):                 # "plain" | "defer" | "exact"
        body_1 = _make_body_1(params, cfg, state, tables, mode, max_len,
                              eos_top=eos_top, row_cap=row_cap,
                              prune_alpha=prune_alpha, block_ngram=block_n)
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
            return r[3], r[4], r[6]

        def keep(_):
            return out[3], out[4], out[6]

        scores, tokens, lengths = jax.lax.cond(out[7], rerun, keep, None)
    else:
        _, _, _, scores, tokens, _, lengths = jax.lax.while_loop(
            cond, make_body("plain"), init)
    return _finalize(tokens, lengths, scores, max_len, length_norm_alpha,
                     mask_incomplete=eos_top)


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
    prune: bool = True,
    block_ngram: int = 0,
) -> tuple:
    """Two-phase straggler-compacted beam search over N = S*chunk sentences.

    The fixed-shape chunked decode pays each chunk's while_loop until its
    SLOWEST row finishes — in the long-caption regime (IKEA, max_len=128)
    measured per-chunk trips were 119–128 while the MEAN best-hypothesis
    length was 24–30: chunk cost is set by straggler rows, not typical
    rows. This search converts that worst-row cost toward near-mean cost
    WHEN stragglers are a minority (step-exact accounting on the IKEA
    exercise checkpoint showed its posterior is the other regime — ~90% of
    sentences keep a live weak beam past t=64 — where no packing can help;
    see docs/architecture.md "Straggler anatomy"). It splits the work at
    `split_len` (L1):

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
    prune_alpha = _resolve_prune(prune, length_norm_alpha)
    block_n = _resolve_block(block_ngram)

    def body_of(st, rc=None):
        return _make_body_1(params, cfg, st, tables, "plain", max_len,
                            eos_top=eos_top, row_cap=rc,
                            prune_alpha=prune_alpha, block_ngram=block_n)

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

    _, _, scores, tokens, _, lengths = packed

    # ---- scatter back to the original row order + finalize ---------------
    inv = jnp.argsort(order)
    scores, tokens, lengths = (jnp.take(scores, inv, axis=0),
                               jnp.take(tokens, inv, axis=0),
                               jnp.take(lengths, inv, axis=0))
    return (_finalize(tokens, lengths, scores, max_len, length_norm_alpha,
                      mask_incomplete=eos_top),
            steps1.astype(jnp.int32), steps2)


def beam_search_streaming(
    params: Dict[str, Any],
    cfg: ModelConfig,
    state: DecodeState,
    *,
    beam_size: int,
    max_len: int,
    slots: int,
    refill_threshold: int = 0,
    length_norm_alpha: float = 1.0,
    tables=None,
    beam_finish: str = "all_frozen",
    row_cap=None,
    prune: bool = True,
    block_ngram: int = 0,
) -> tuple:
    """Streaming-refill beam search over an N-sentence pool (continuous
    batching for beam search, cf. "A Streaming Approach For Efficient
    Batched Beam Search", arXiv:2010.02164, adapted to fixed XLA shapes).

    The chunked decode quantizes the corpus into fixed chunks and pays each
    chunk until its slowest row finishes; the two-phase ladder reduces that
    to near-mean cost at rung granularity. This path removes the chunk
    quantization entirely: a fixed working set of `slots` rows decodes in
    ONE while_loop, and whenever at least `refill_threshold` sentences in
    the set are finished, a lax.cond-gated refill (so the loop's hot path
    pays nothing when it does not fire) compacts live rows to the front
    (stable argsort), scatters the finished rows' results into per-pool-row
    output buffers, and pulls the next sentences' encoder state from the
    pool. Total trips approach sum(service_i)/slots — the streaming
    optimum — instead of sum over chunks of max(service in chunk), where a
    row's SERVICE TIME is the steps until its termination semantic fires.

    MEASURED NEGATIVE RESULT for the offline fused path (default therefore
    OFF, VAG_STREAM_DECODE/decode.streaming opt in): translate sorts the
    corpus by source length, and service time is strongly length-
    correlated (under "all_frozen" it is the all-beams-freeze time, not
    the hypothesis length), so sorted chunks are already near-homogeneous
    in service time and chunked max ~= streaming mean. On the m30k
    exercise checkpoint (real heterogeneous trips 24-64/chunk) streaming
    did 341 slot-steps vs chunked 334 (riding between refills + the
    drain tail) at ~10% extra per-step cost (vector-t body, bigger
    carry); at the sorted-homogeneous driver bench it measured 15.6k vs
    20.4k sent/s. Its regime is UNSORTED or online/continuous workloads,
    where chunk quantization costs ~max_len per mixed chunk — there the
    pool refill is the right architecture (cf. the paper).

    EXACT per sentence: the step body is row-local and each row's carry
    evolves identically whatever slot it rides in (same argument as
    beam_search_two_phase; per-row t replaces the shared step counter, and
    frozen rows are value-preserving no-ops until replaced). Runs
    mode="plain" bodies; the deferred-exactness knob is ignored here.

    refill_threshold: 0 -> slots // 4 (hysteresis: refilling every step
    would pay the compaction gathers ~every step; waiting for ~25% of the
    set amortizes them at a small extra ride cost for finished rows).

    Returns (BeamResult over the N pool rows (pool order), steps () int32
    realized while_loop trips — each costs one `slots`-row decoder step —
    and refills () int32 refill events)."""
    if beam_finish not in ("all_frozen", "eos_top"):
        raise ValueError(f"unknown beam_finish {beam_finish!r}")
    eos_top = beam_finish == "eos_top"
    prune_alpha = _resolve_prune(prune, length_norm_alpha)
    block_n = _resolve_block(block_ngram)
    N = state.s0.shape[0]
    W = min(slots, N)
    K = beam_size
    R = refill_threshold if refill_threshold > 0 else max(1, W // 4)
    R = min(R, W)

    pool_ctx, pool_proj, pool_mask, pool_s0 = (
        state.ctx, state.ctx_proj, state.src_mask, state.s0)

    def fresh_scores(n):
        return jnp.tile(
            jnp.asarray([0.0] + [NEG_INF] * (K - 1), jnp.float32), (n, 1))

    # Working set starts as pool rows [0, W).
    init = (
        jnp.arange(W, dtype=jnp.int32),                      # ids
        jnp.zeros((W,), jnp.int32),                          # t (per row)
        jnp.full((W, K), SOS_ID, jnp.int32),                 # last_tok
        jnp.broadcast_to(pool_s0[:W, None, :],
                         (W, K, pool_s0.shape[-1])),         # s
        fresh_scores(W),                                     # scores
        jnp.full((W, K, max_len), PAD_ID, jnp.int32),        # hist
        jnp.zeros((W, K), bool),                             # finished
        jnp.zeros((W, K), jnp.int32),                        # lengths
        pool_ctx[:W], pool_proj[:W], pool_mask[:W],          # working state
        (None if row_cap is None else row_cap[:W]),          # cap_w
        jnp.asarray(W, jnp.int32),                           # next
        jnp.asarray(0, jnp.int32),                           # steps
        jnp.asarray(0, jnp.int32),                           # refills
        # per-pool-row outputs (+1 scratch row for live/sentinel dumps)
        jnp.full((N + 1, K, max_len), PAD_ID, jnp.int32),
        jnp.zeros((N + 1, K), jnp.float32),
        jnp.zeros((N + 1, K), jnp.int32),
    )

    def cond(c):
        nxt, finished = c[12], c[6]
        return (nxt < N) | ~jnp.all(finished)

    def body(c):
        (ids, t, last_tok, s, scores, hist, finished, lengths,
         ctx_w, proj_w, mask_w, cap_w, nxt, steps, refills,
         o_tok, o_sc, o_len) = c
        st = DecodeState(ctx=ctx_w, ctx_proj=proj_w, src_mask=mask_w,
                         s0=jnp.zeros((W, s.shape[-1]), s.dtype))
        step1 = _make_body_1(params, cfg, st, tables, "plain", max_len,
                             eos_top=eos_top, row_cap=cap_w,
                             prune_alpha=prune_alpha, block_ngram=block_n)
        t, last_tok, s, scores, hist, finished, lengths = step1(
            (t, last_tok, s, scores, hist, finished, lengths))

        fin_sent = jnp.all(finished, axis=1)                 # (W,)
        n_fin = jnp.sum(fin_sent).astype(jnp.int32)

        def refill(args):
            (ids, t, last_tok, s, scores, hist, finished, lengths,
             ctx_w, proj_w, mask_w, cap_w, nxt, refills,
             o_tok, o_sc, o_len) = args
            perm = jnp.argsort(fin_sent.astype(jnp.int32), stable=True)

            def tk(a):
                return None if a is None else jnp.take(a, perm, axis=0)

            (ids, t, last_tok, s, scores, hist, finished, lengths,
             ctx_w, proj_w, mask_w, cap_w) = map(
                tk, (ids, t, last_tok, s, scores, hist, finished, lengths,
                     ctx_w, proj_w, mask_w, cap_w))
            slot = jnp.arange(W, dtype=jnp.int32)
            n_live = W - n_fin
            is_refill = slot >= n_live
            # Emit the replaced (finished) rows; everything else dumps into
            # scratch row N.
            emit_idx = jnp.where(is_refill, ids, N)
            o_tok = o_tok.at[emit_idx].set(hist)
            o_sc = o_sc.at[emit_idx].set(scores)
            o_len = o_len.at[emit_idx].set(lengths)
            # Issue the next pool rows (row id N = exhausted sentinel).
            cand = nxt + slot - n_live
            sent = cand >= N
            new_ids = jnp.where(is_refill, jnp.where(sent, N, cand), ids)
            gid = jnp.minimum(new_ids, N - 1)

            def pull(pool, work, extra_dims):
                fresh = jnp.take(pool, gid, axis=0)
                m = is_refill.reshape((W,) + (1,) * extra_dims)
                return jnp.where(m, fresh, work)

            ctx_w = pull(pool_ctx, ctx_w, 2)
            proj_w = pull(pool_proj, proj_w, 2)
            mask_w = pull(pool_mask, mask_w, 1)
            if cap_w is not None:
                cap_w = pull(row_cap, cap_w, 0)
            s = pull(jnp.broadcast_to(pool_s0[:, None, :],
                                      (N, K, pool_s0.shape[-1])), s, 2)
            dead = (is_refill & sent)[:, None]
            t = jnp.where(is_refill, 0, t)
            last_tok = jnp.where(is_refill[:, None], SOS_ID, last_tok)
            scores = jnp.where(is_refill[:, None], fresh_scores(W), scores)
            hist = jnp.where(is_refill[:, None, None], PAD_ID, hist)
            finished = jnp.where(is_refill[:, None], dead, finished)
            lengths = jnp.where(is_refill[:, None], 0, lengths)
            nxt = jnp.minimum(jnp.asarray(N, jnp.int32), nxt + n_fin)
            return (new_ids, t, last_tok, s, scores, hist, finished,
                    lengths, ctx_w, proj_w, mask_w, cap_w, nxt, refills + 1,
                    o_tok, o_sc, o_len)

        args = (ids, t, last_tok, s, scores, hist, finished, lengths,
                ctx_w, proj_w, mask_w, cap_w, nxt, refills,
                o_tok, o_sc, o_len)
        out = jax.lax.cond((n_fin >= R) & (nxt < N), refill,
                           lambda a: a, args)
        (ids, t, last_tok, s, scores, hist, finished, lengths,
         ctx_w, proj_w, mask_w, cap_w, nxt, refills,
         o_tok, o_sc, o_len) = out
        return (ids, t, last_tok, s, scores, hist, finished, lengths,
                ctx_w, proj_w, mask_w, cap_w, nxt, steps + 1, refills,
                o_tok, o_sc, o_len)

    fin = jax.lax.while_loop(cond, body, init)
    (ids, _, _, _, scores, hist, finished, lengths,
     _, _, _, _, _, steps, refills, o_tok, o_sc, o_len) = fin
    # Final emission: every resident slot holds a distinct pool row.
    o_tok = o_tok.at[ids].set(hist)
    o_sc = o_sc.at[ids].set(scores)
    o_len = o_len.at[ids].set(lengths)
    res = _finalize(o_tok[:N], o_len[:N], o_sc[:N], max_len,
                    length_norm_alpha, mask_incomplete=eos_top)
    return res, steps, refills
