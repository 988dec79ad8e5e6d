"""Fused readout-GEMM + log-softmax + beam top-k (SURVEY.md C12; VERDICT r2
item 1 — the decode step's vocab pipeline was its dominant HBM cost).

The unfused beam step materializes the (B*K, V) fp32 logits in HBM (~20 MB
at the flagship shape), then reads them for logsumexp, reads them again to
build the candidate grid, and reads them once more inside top-k — >80 MB of
HBM round trips per decode step for ~2.6 GFLOP of matmul. This kernel fuses
the whole vocab pipeline into ONE streaming pass that never leaves VMEM:

    for each 512-wide vocab block j:
        logits_blk = t @ W[:, j] + b[j]          (MXU, fp32 accumulate)
        per-lane online logsumexp update          (VPU)
        per-lane running top-K insertion cascade  (VPU, ops/pallas_topk gen-3)
    final block: K cross-lane extract-max rounds -> per-row top-K,
                 cross-lane logsumexp merge       -> per-row lse

HBM traffic per step drops to reading t (R,E) once + W (E,V) once (~4.3 MB
bf16) + (R,K) outputs — the (R,V) logits never exist in HBM.

The live/frozen candidate semantics and the K*K -> K cross-beam combine
(identical to ops/pallas_topk.beam_topk's contract) are applied to the tiny
(R, K) kernel outputs in XLA:

    live row:    cand = (scores - lse) + topk_raw_logits
    frozen row:  [(scores, pad_id), (scores + NEG_INF, next smallest ids)]

Per-row ordering is exact (adding the per-row base preserves the raw-logit
order); cross-beam values match beam_topk bitwise except when fp32 rounding
of base+logit creates a tie that did not exist in the raw logits — a
measure-zero corner the parity tests cover with integer-valued weights
(exact) plus random-data index equality.

Cost anatomy (r4, fetch-delta at R=640, V=8000, E=256 on 1xv5e): the hot
loop (GEMM + cascade + online lse) is ~26 us — the cascade and lse are
nearly free next to the MXU work — and the CROSS-LANE MERGE dominated at
~51 us/call (2*sk lane reductions per extract round = Mosaic relayouts).
Concatenating the slot arrays first (2 reductions per round) cut the merge
to ~22 us: whole kernel 96.6 -> 54.9 us/call in deferred mode. A variant
moving the merge to XLA entirely (kernel emits raw (R, sk*128) slots, XLA
does one lexicographic 2-key sort) measured WORSE (128 us: the sort plus
per-grid-step writeback of output-ref state) and was removed."""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vag_nmt_tpu.core.config import PAD_ID
from vag_nmt_tpu.ops.pallas_topk import NEG_INF, _FLOOR, _interpret


# Mosaic's default scoped-VMEM budget is 16 MB; at the IKEA regime (V=13381,
# fp32 params) the depth-K exactness-fallback branch measured 16.11 MB of
# stack (kernel scratch + double-buffered (E, tv) weight blocks, with BOTH
# cond branches' kernels allocated in one stack frame), a 116 KB overshoot.
# 32 MB bounds only the scoped allocation, not total VMEM (128 MB on v5e).
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=32 * 1024 * 1024)


def deferred_exactness_active(K: int) -> bool:
    """Trace-time decision for decode/beam.py: use CHUNK-level deferred
    exactness recovery (carry the watermark flag through the while_loop and
    rerun the chunk with the depth-K kernel iff it fired) instead of the
    per-step lax.cond fallback.

    History: this FIRST measured a large NEGATIVE (per-step cond 201 vs
    deferred 309 us/step) because the watermark flag was armed by FROZEN
    rows — whose kernel outputs are discarded by _combine — and bf16 logit
    ties on mostly-frozen late-decode chunks fired it near-constantly, so
    the chunk-level recovery repaid whole chunks for violations that could
    not affect the result. Two review findings later resolved this: (a)
    the flag is now masked to LIVE rows only (fused_readout_topk), and (b)
    the A/B harness itself was found tracing BOTH legs under one env
    setting (jit traces at first call, which happened after the env was
    restored), so earlier numbers compared identical programs. With both
    fixed, the valid interleaved full-beam-search A/B
    (benchmarks/defer_ab.py, 25 iters, 1xv5e): deferred 249.5 vs per-step
    cond 271.0 us/step — removing the cond's fixed cost wins ~8%, with
    live-row violations at the analytic ~2e-6/row/step rate. ON (on TPU)
    whenever the resolved slot depth < K; VAG_FRT_DEFER=0 restores the
    per-step cond for A/B. NOTE (r4): the default slot depth is now K —
    the merge restructure made full-depth cascades CHEAPER end-to-end
    than slots-3 + this recovery machinery (see fused_readout_topk's
    slots note), so by default no recovery path is live at all; this
    function (and the whole watermark apparatus) governs the
    VAG_FRT_SLOTS<K regime.

    True iff the fused-kernel path would be active under the same
    env/backend resolution `models.model.decode_step_topk` uses, the
    resolved slot depth is < K (a per-step cond would otherwise exist),
    VAG_FRT_DEFER is not "0", and VAG_FRT_NOCOND=1 (bench-only knob whose
    meaning is "no recovery at all") is not set."""
    if os.environ.get("VAG_FRT_DEFER", "") == "0":
        return False
    if os.environ.get("VAG_FRT_NOCOND", "") == "1":
        return False
    impl = os.environ.get("VAG_READOUT_TOPK", "")
    if impl not in ("fused", "unfused"):
        impl = "fused" if jax.default_backend() == "tpu" else "unfused"
    if impl != "fused":
        return False
    env_s = os.environ.get("VAG_FRT_SLOTS", "")
    slots = int(env_s) if env_s else K
    return min(max(1, slots), K) < K


def _kernel(t_ref, w_ref, b_ref, *rest, V: int, tv: int, K: int, sk: int,
            direct: bool, has_ban: bool = False, no_lse: bool = False,
            no_cascade: bool = False):
    """Grid (nv,): one row tile holding all R rows; vocab streams in tv-wide
    blocks. Scratch (persists across grid steps): lg (R, tv) f32 logits
    block, s_l (R, 128) per-lane sumexp relative to the per-lane max
    (= running top-1 slot), w_mark (R, 128) watermark (see below), slots =
    sk vals refs + sk idx refs (R, 128).

    sk: per-lane slot DEPTH. sk == K is unconditionally exact (a global
    top-K member can share its lane with at most K-1 greater values). With
    sk = 3 < K the cascade runs ~40% fewer ops per element and stays exact
    unless some lane holds >= sk+1 of a row's true top-K — detected via the
    WATERMARK w_mark = max of each lane's displaced values (its (sk+1)-th
    best): a row is flagged (viol_ref) iff any lane's watermark >= the
    row's provisional K-th value, in which case the caller reruns with
    sk=K (probability ~(K choose sk+1)/128^sk per row — ~2e-6 at K=5,sk=3).

    direct=True computes the GEMM per 128-lane sub-tile straight into
    registers (slicing the w REF) instead of materializing the (R, tv)
    logits block in VMEM scratch first.

    has_ban: a fourth input ref — an (R, tv) uint8 block of the dense
    no-repeat n-gram ban mask (decode/beam.ngram_ban scattered over the
    vocab axis by fused_readout_topk) streamed with the same vocab-block
    index map as w. Banned lanes are floored BEFORE the online lse update
    and the cascade, so the softmax normalization excludes the banned
    mass — the same semantics as the unfused path's pre-beam_topk logits
    scatter (r4: blocking previously forced the whole unfused pipeline,
    measured ~1.6-1.9x slower per step at IKEA shapes)."""
    if has_ban:
        ban_ref = rest[0]
        rest = rest[1:]
    vals_ref, idx_ref, lse_ref, viol_ref, lg, s_l, w_mark = rest[:7]
    slots = rest[7:]
    j = pl.program_id(0)
    nv = pl.num_programs(0)
    run_vals = slots[:sk]
    run_idx = slots[sk:]
    R = t_ref.shape[0]

    @pl.when(j == 0)
    def _():
        for i in range(sk):
            run_vals[i][:] = jnp.full_like(run_vals[i], _FLOOR)
            run_idx[i][:] = jnp.zeros_like(run_idx[i])
        s_l[:] = jnp.zeros_like(s_l)
        if sk < K:
            w_mark[:] = jnp.full_like(w_mark, _FLOOR)

    if not direct:
        # The vocab-block GEMM: (R, E) x (E, tv) on the MXU, fp32
        # accumulate. Written to VMEM scratch so the per-128-lane sub-tiles
        # below slice a REF, not a computed value (lane-slicing
        # computed/broadcast values crashes Mosaic's layout inference — see
        # ops/pallas_topk.py gen-3).
        lg[:] = (jnp.dot(t_ref[...], w_ref[...],
                         preferred_element_type=jnp.float32)
                 + b_ref[...].astype(jnp.float32))

    vals = [run_vals[i][...] for i in range(sk)]
    idxs = [run_idx[i][...] for i in range(sk)]
    s = s_l[...]
    wm = w_mark[...] if sk < K else None
    t_blk = t_ref[...] if direct else None
    for c in range(tv // 128):
        xi = (j * tv + c * 128
              + jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1))
        if direct:
            x = (jnp.dot(t_blk, w_ref[:, c * 128:(c + 1) * 128],
                         preferred_element_type=jnp.float32)
                 + b_ref[0, c * 128:(c + 1) * 128][None, :]
                 .astype(jnp.float32))
        else:
            x = lg[:, c * 128:(c + 1) * 128]
        x = jnp.where(xi < V, x, _FLOOR)
        if has_ban:
            x = jnp.where(ban_ref[:, c * 128:(c + 1) * 128] != 0, _FLOOR, x)
        # Online logsumexp, per lane, referenced to the running top-1 slot
        # (vals[0] IS the per-lane max). _FLOOR fillers contribute exp of
        # ~-3e38 -> exactly 0. (no_lse/no_cascade are BENCH-ONLY cost-split
        # knobs for benchmarks/fused_topk_tune.py — never set in production.)
        if not no_lse:
            m_old = vals[0]
            m_new = jnp.maximum(m_old, x)
            s = s * jnp.exp(m_old - m_new) + jnp.exp(x - m_new)
        if no_cascade:
            # bench-only: keep just the max tracker the lse references
            vals[0] = jnp.maximum(vals[0], x)
            continue
        # Insertion cascade (branch-free): x sinks through the sk sorted
        # slots; strict > keeps the stored (earlier-index) entry on ties.
        for i in range(sk):
            gt = x > vals[i]
            vals[i], x = jnp.maximum(vals[i], x), jnp.minimum(vals[i], x)
            idxs[i], xi = (jnp.where(gt, xi, idxs[i]),
                           jnp.where(gt, idxs[i], xi))
        if sk < K:
            # x now holds the value displaced out of the last slot — the
            # lane's (sk+1)-th best so far feeds the exactness watermark.
            wm = jnp.maximum(wm, x)
    for i in range(sk):
        run_vals[i][:] = vals[i]
        run_idx[i][:] = idxs[i]
    s_l[:] = s
    if sk < K:
        w_mark[:] = wm

    @pl.when(j == nv - 1)
    def _():
        # Cross-lane top-K merge: K extract-max rounds over the slot arrays
        # CONCATENATED to one (R, sk*128) value (r4: the original per-slot
        # rounds did 2*sk cross-lane reductions each — ~51 us/call of
        # Mosaic relayouts at the flagship shape, over half the WHOLE
        # kernel; concatenating first needs exactly 2 reductions per round,
        # measured ~22 us). Removal matches on (value, index) so duplicates
        # of the extracted value elsewhere survive later rounds; ties pick
        # the smaller vocab index across ALL slots at once — identical
        # semantics to the per-slot form (each vocab id occupies exactly
        # one slot position), matching lax.top_k.
        Xv = jnp.concatenate([run_vals[i][...] for i in range(sk)], axis=1)
        Xi = jnp.concatenate([run_idx[i][...] for i in range(sk)], axis=1)
        BIG = jnp.int32(2 ** 30)
        out_v = []
        out_i = []
        for _ in range(K):
            mx = Xv.max(axis=1)                                    # (R,)
            a = jnp.min(jnp.where(Xv == mx[:, None], Xi, BIG),
                        axis=1).astype(jnp.int32)
            out_v.append(mx)
            out_i.append(a)
            Xv = jnp.where((Xv == mx[:, None]) & (Xi == a[:, None]),
                           _FLOOR, Xv)
        vals_ref[...] = jnp.stack(out_v, axis=1)
        idx_ref[...] = jnp.stack(out_i, axis=1)
        if sk < K:
            tau = out_v[K - 1]                                     # (R,)
            viol_ref[...] = jnp.max(
                (w_mark[...] >= tau[:, None]).astype(jnp.int32),
                axis=1)[:, None]
        else:
            viol_ref[...] = jnp.zeros_like(viol_ref)
        # Cross-lane logsumexp merge: M = max lane max; S = sum of per-lane
        # sums rescaled to M.
        m_l = run_vals[0][...]
        M = jnp.max(m_l, axis=1)                                   # (R,)
        S = jnp.sum(s_l[...] * jnp.exp(m_l - M[:, None]), axis=1)
        lse_ref[...] = (M + jnp.log(S))[:, None]


def _combine(rvals, ridx, lse, scores, finished, V, pad_id):
    """Apply live/frozen candidate semantics to the per-row (R, K) raw-logit
    top-K and run the K*K -> K cross-beam combine (beam_topk's contract)."""
    B, K = scores.shape
    rvals = rvals.reshape(B, K, K)
    ridx = ridx.reshape(B, K, K)
    lse = lse.reshape(B, K)
    base = scores - jnp.where(finished, 0.0, lse)

    live_vals = base[..., None] + rvals
    slot = jnp.arange(K, dtype=jnp.int32)
    froz_vals = jnp.where(slot == 0, base[..., None],
                          base[..., None] + NEG_INF)
    # Frozen-row candidates as beam_topk sees them: base at pad_id, then
    # base+NEG_INF at the smallest vocab ids != pad_id (tie-break order).
    rest = slot[:-1] + (slot[:-1] >= pad_id)
    froz_idx = jnp.concatenate(
        [jnp.asarray([pad_id], jnp.int32), rest.astype(jnp.int32)])

    fin3 = finished[..., None]
    vals = jnp.where(fin3, froz_vals, live_vals)
    idx = jnp.where(fin3, froz_idx[None, None, :], ridx)
    beam = jnp.arange(K, dtype=jnp.int32)[None, :, None]
    flat = (idx + beam * V).reshape(B, K * K)
    top, pos = jax.lax.top_k(vals.reshape(B, K * K), K)
    return top, jnp.take_along_axis(flat, pos, axis=1)


@functools.partial(jax.jit,
                   static_argnames=("pad_id", "impl", "tv", "direct",
                                    "slots", "defer_exact",
                                    "_bench_no_lse", "_bench_no_cascade"))
def fused_readout_topk(
    t: jnp.ndarray,           # (B*K, E) readout activations (beam-major rows)
    w: jnp.ndarray,           # (E, V) output matrix (compute dtype)
    b: jnp.ndarray,           # (V,) fp32 output bias
    scores: jnp.ndarray,      # (B, K) fp32 running beam scores
    finished: jnp.ndarray,    # (B, K) bool
    ban: jnp.ndarray = None,  # optional (B*K, M) int32 banned ids (V = none)
    *,
    pad_id: int = PAD_ID,
    impl: str = "auto",
    tv: int = 512,
    direct: bool = True,
    slots: int = 0,
    defer_exact: bool = False,
    _bench_no_lse: bool = False,
    _bench_no_cascade: bool = False,
) -> Tuple[jnp.ndarray, ...]:
    """Top-K next-beam candidates straight from the readout activations.

    Identical contract to ops/pallas_topk.beam_topk applied to
    ``logits = t @ w + b`` reshaped to (B, K, V): returns (top_scores (B, K)
    fp32 descending, flat_idx (B, K) int32, flat = beam * V + token) — but
    the logits are never materialized in HBM.

    impl: "auto" (kernel on TPU, xla elsewhere; env VAG_READOUT_TOPK
    overrides), "pallas" (force kernel), "xla" (materialize logits and call
    beam_topk's xla path — the numerics oracle).

    slots: per-lane cascade depth (0 = auto: K, unconditionally exact; env
    VAG_FRT_SLOTS overrides). Depth < K cuts the per-element cascade cost
    and stays EXACT via watermark detection + lax.cond fallback to the
    full-depth kernel (see _kernel docstring) — results match the depth-K
    kernel bit for bit on every input. History: slots-3 + deferred
    recovery was the r3 default, chosen when the cross-lane merge made
    cascade rounds expensive; after the r4 merge restructure the full
    corpus decode measures FASTER at depth K (benchmarks/
    decode_knob_sweep.py, interleaved, K=5: slots-5 beat slots-3 by ~6%
    at every chunk size — 25.2k vs 23.4k sent/s at chunk 64 — because
    depth K also removes the defer/rerun machinery from the loop), so
    auto is now K.

    defer_exact: skip the in-step lax.cond fallback and instead return a
    THIRD output — a scalar bool that is True iff the watermark flagged any
    row (i.e. the fast result MAY be inexact). The caller owns recovery:
    decode/beam.py ORs the flag across all steps of a chunk and reruns the
    whole chunk with the depth-K kernel when it fired (chunk-level cond,
    P ~2e-6/row/step of firing), which removes the measured ~17 us/step
    in-context cost of the per-step cond from the hot loop. When the depth
    is already exact (sk >= K) the flag is constant False.

    ban: optional (B*K, M) int32 banned token ids (no-repeat n-gram
    blocking; id == V is a no-op sentinel). Scattered into a dense
    (B*K, V) uint8 mask that streams through the kernel with the vocab
    blocks — banned logits are floored before the online lse and the
    cascade, excluding their mass from the softmax normalization exactly
    as the unfused path's pre-beam_topk logits scatter does."""
    B, K = scores.shape
    E, V = w.shape
    R = t.shape[0]
    if R != B * K:
        raise ValueError(f"t rows {R} != B*K = {B * K}")

    # VAG_FRT_GEMM_DTYPE=bf16: run the vocab GEMM's operands in bf16 even
    # when the decode compute dtype is fp32 (mixed mode: fp32 mid-section
    # + bf16 vocab pipeline). The (E, V) cast is loop-invariant — XLA
    # hoists it out of the beam while_loop — so the kernel streams half
    # the table bytes per step; accumulation stays fp32 either way.
    # MEASURED NEGATIVE at flagship shapes (r5 interleaved e2e A/B under
    # the fp32-decode default: 22.0k vs 22.6k sent/s median — the kernel
    # is latency-bound, not table-bandwidth-bound, at V=8000), so the
    # default stays fp32; kept as the A/B knob for larger-vocab regimes
    # (part of translate's program-cache env fingerprint).
    if (os.environ.get("VAG_FRT_GEMM_DTYPE", "") in ("bf16", "bfloat16")
            and w.dtype == jnp.float32):
        t = t.astype(jnp.bfloat16)
        w = w.astype(jnp.bfloat16)

    if impl == "auto":
        impl = os.environ.get("VAG_READOUT_TOPK", "")
        if impl not in ("xla", "pallas"):
            impl = "pallas" if jax.default_backend() == "tpu" else "xla"

    if impl == "xla":
        from vag_nmt_tpu.ops.pallas_topk import beam_topk

        logits = (jnp.dot(t, w, preferred_element_type=jnp.float32)
                  + b.astype(jnp.float32))
        if ban is not None:
            rows = jnp.arange(R, dtype=jnp.int32)[:, None]
            logits = logits.at[rows, ban].min(jnp.float32(_FLOOR))
        out = beam_topk(logits.reshape(B, K, V), scores, finished,
                        pad_id=pad_id, impl="xla")
        return out + (jnp.zeros((), bool),) if defer_exact else out

    if slots <= 0:
        env_s = os.environ.get("VAG_FRT_SLOTS", "")
        slots = int(env_s) if env_s else K
    sk = min(max(1, slots), K)
    nv = -(-V // tv)

    mask = None
    if ban is not None:
        # Dense uint8 ban mask, streamed block-by-block with the vocab
        # tiles (adds ~V bytes/row/step of HBM traffic — at the IKEA shape
        # (R=640, V=13381) that is ~8.6 MB/step, vs the ~54 MB of fp32
        # logits round trips the unfused fallback re-materializes).
        rows = jnp.arange(R, dtype=jnp.int32)[:, None]
        mask = jnp.zeros((R, V), jnp.uint8).at[rows, ban].set(
            jnp.uint8(1))  # sentinel V is out of range -> dropped

    def call_kernel(depth: int):
        ban_in = [] if mask is None else [
            pl.BlockSpec((R, tv), lambda j: (0, j),
                         memory_space=pltpu.VMEM)]
        return pl.pallas_call(
            functools.partial(_kernel, V=V, tv=tv, K=K, sk=depth,
                              direct=direct, has_ban=mask is not None,
                              no_lse=_bench_no_lse,
                              no_cascade=_bench_no_cascade),
            grid=(nv,),
            in_specs=[
                pl.BlockSpec((R, E), lambda j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((E, tv), lambda j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tv), lambda j: (0, j),
                             memory_space=pltpu.VMEM),
            ] + ban_in,
            out_specs=[
                pl.BlockSpec((R, K), lambda j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((R, K), lambda j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((R, 1), lambda j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((R, 1), lambda j: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((R, K), jnp.float32),
                jax.ShapeDtypeStruct((R, K), jnp.int32),
                jax.ShapeDtypeStruct((R, 1), jnp.float32),
                jax.ShapeDtypeStruct((R, 1), jnp.int32),
            ],
            scratch_shapes=([pltpu.VMEM((8, 128) if direct else (R, tv),
                                        jnp.float32),
                             pltpu.VMEM((R, 128), jnp.float32),
                             pltpu.VMEM((R, 128), jnp.float32)]
                            + [pltpu.VMEM((R, 128), jnp.float32)] * depth
                            + [pltpu.VMEM((R, 128), jnp.int32)] * depth),
            compiler_params=_COMPILER_PARAMS,
            interpret=_interpret(),
        )(*((t, w, b.reshape(1, V))
            + (() if mask is None else (mask,))))

    scores32 = scores.astype(jnp.float32)
    rvals, ridx, lse, viol = call_kernel(sk)
    if sk >= K:
        out = _combine(rvals, ridx, lse, scores32, finished, V, pad_id)
        return out + (jnp.zeros((), bool),) if defer_exact else out
    # A watermark violation on a FROZEN row cannot change the result —
    # _combine replaces frozen rows' kernel outputs with the analytic
    # pad/NEG_INF candidates — so only live rows arm the fallback. Late in
    # a beam decode most rows are frozen and bf16 logit ties fire their
    # watermarks constantly (the measured reason chunk-level deferral lost
    # 201 vs 309 us/step); masking them removes those spurious depth-K
    # reruns at zero exactness cost (found in review; parity tests pin it).
    live_viol = jnp.any((viol[:, 0] > 0) & ~finished.reshape(-1))
    if defer_exact:
        return _combine(rvals, ridx, lse, scores32, finished, V,
                        pad_id) + (live_viol,)
    if os.environ.get("VAG_FRT_NOCOND", "") == "1":
        # BENCH-ONLY: skip the exactness fallback to measure the lax.cond's
        # per-step cost in context. NOT exact (P ~2e-6/row of a wrong
        # candidate) — never enable for scoring runs.
        return _combine(rvals, ridx, lse, scores32, finished, V, pad_id)

    def fast(_):
        return _combine(rvals, ridx, lse, scores32, finished, V, pad_id)

    def exact(_):
        rv, ri, ls, _unused = call_kernel(K)
        return _combine(rv, ri, ls, scores32, finished, V, pad_id)

    return jax.lax.cond(live_viol, exact, fast, None)
