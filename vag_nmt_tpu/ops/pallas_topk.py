"""Beam-search candidate scoring + top-k: XLA path and a Pallas TPU kernel
(SURVEY.md C12, §7 hard part 1).

The beam inner loop needs, per step,

    cand[b, k, v] = scores[b,k] + logits[b,k,v] - lse[b,k]     (live beam)
                    scores[b,k] if v == pad_id else -inf       (finished beam)

followed by top-K over each sentence's K*V candidate row. Four
implementations with identical results (tests assert exact equality):

- `impl="xla"`: fused candidate computation + `lax.top_k` with an
  optimization barrier between them.
- `impl="pallas"` (gen 1) and `impl="pallas_rows"` (gen 2): streaming
  running-top-K kernels whose selection runs K cross-lane extract-max
  reductions PER VOCAB BLOCK — measured 702 / 522 us vs XLA's 243 at the
  decode shape with the round-1 timing harness. Kept as the record of the
  tuning path.
- `impl="pallas_lanes"` (gen 3, PRODUCTION DEFAULT on TPU for K <= 8): the
  cross-lane reductions were the whole gap, so the hot loop has none —
  every lane keeps its own running top-K via a branch-free insertion
  cascade (element-wise max/min/select only), and the K extract-max rounds
  over the (R, K*128) per-lane state run ONCE per row tile on the last
  vocab block. Re-measured with the honest fetch-delta harness
  (benchmarks/topk_bench.py; `block_until_ready` does not block on the
  tunneled platform): XLA 142 -> lanes 111 us at B=128,K=5,V=8000;
  136 -> 66 at B=64; 363 -> 208 at V=16384. The cascade is ~K^2, so K=12
  loses (1334 vs 694) — `auto` selects by K, env `VAG_TOPK_IMPL` overrides.

Tie-breaking: smaller flat index within a vocab block, earlier blocks
across blocks (matching top_k except a cross-beam/cross-block tie
corner)."""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vag_nmt_tpu.core.config import PAD_ID

NEG_INF = -1e9          # finished-beam filler, matches decode/beam.py
_FLOOR = -3.0e38        # "smaller than any candidate" for masking


def _pick_row_tile(B: int) -> int:
    """Sublane row tile for the beam top-k kernels: largest of {16, 8, 4, 1}
    dividing B (shared with ops/topk_legacy so retunes stay in sync)."""
    return 16 if B % 16 == 0 else (8 if B % 8 == 0 else (4 if B % 4 == 0
                                                         else 1))


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _kernel_lanes(logits_ref, base_ref, fin_ref, vals_ref, idx_ref,
                  *scratch, V: int, tv: int, pad_id: int, K: int):
    """Lane-parallel running top-K — third-generation layout.

    The first two kernels lose to XLA because they run K cross-lane
    extract-max reductions PER VOCAB BLOCK (each a multi-step tree over the
    lane dim). Here the hot loop has NO cross-lane work at all: every lane
    keeps its own running top-K of the candidates it has seen, maintained by
    a branch-free insertion cascade (K max/min/select rounds per 128-lane
    sub-tile, all element-wise). The only cross-lane reductions are K
    extract-max rounds over the final (R, K*128) per-lane state, ONCE per
    row tile on the last vocab block. Correctness: any global top-K element
    is in its lane's top-K (at most K-1 greater values can share its lane).
    Tie rule matches the other impls: smaller vocab index wins at equal
    value (in-lane: stored-first insertion, i.e. earlier block; cross-lane:
    min-index among value matches in the final merge)."""
    j = pl.program_id(1)
    nv = pl.num_programs(1)
    run_vals = scratch[:K]                       # K refs of (R, 128) f32
    run_idx = scratch[K:]                        # K refs of (R, 128) i32

    @pl.when(j == 0)
    def _():
        for i in range(K):
            run_vals[i][:] = jnp.full_like(run_vals[i], _FLOOR)
            run_idx[i][:] = jnp.zeros_like(run_idx[i])

    R = base_ref.shape[0]
    base = base_ref[...]                         # (R, 1)
    fin = fin_ref[...]                           # (R, 1)

    vals = [run_vals[i][...] for i in range(K)]
    idxs = [run_idx[i][...] for i in range(K)]
    # Candidates are built PER 128-lane sub-tile, slicing the logits ref
    # directly and broadcasting the (R,1) row terms afterwards — lane-slicing
    # a broadcast/iota result crashes Mosaic's layout inference
    # ("limits[i] <= dim(i)" check in array.h, observed on v5e).
    for c in range(tv // 128):
        xi = (j * tv + c * 128
              + jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1))
        live = logits_ref[:, c * 128:(c + 1) * 128] + base
        froz = jnp.where(xi == pad_id, base, base + NEG_INF)
        x = jnp.where(fin > 0, froz, live)
        x = jnp.where(xi < V, x, _FLOOR)
        # Insertion cascade: x sinks through the sorted-by-value slots.
        # Strict > keeps the stored (earlier-index) entry above on ties.
        for i in range(K):
            gt = x > vals[i]
            vals[i], x = jnp.maximum(vals[i], x), jnp.minimum(vals[i], x)
            idxs[i], xi = (jnp.where(gt, xi, idxs[i]),
                           jnp.where(gt, idxs[i], xi))
    for i in range(K):
        run_vals[i][:] = vals[i]
        run_idx[i][:] = idxs[i]

    @pl.when(j == nv - 1)
    def _():
        # Final cross-lane merge, slot-wise (no lane concatenation — Mosaic
        # crashed on it): K extract-max rounds over the K (R,128) slot
        # arrays; removal matches on (value, index) so duplicates of the
        # extracted value elsewhere survive for later rounds.
        sv = [run_vals[i][...] for i in range(K)]
        si = [run_idx[i][...] for i in range(K)]
        BIG = jnp.int32(2**30)
        out_v = []
        out_i = []
        for _ in range(K):
            m = sv[0].max(axis=1)
            for i in range(1, K):
                m = jnp.maximum(m, sv[i].max(axis=1))              # (R,)
            a = jnp.min(jnp.where(sv[0] == m[:, None], si[0], BIG), axis=1)
            for i in range(1, K):
                a = jnp.minimum(
                    a, jnp.min(jnp.where(sv[i] == m[:, None], si[i], BIG),
                               axis=1))
            a = a.astype(jnp.int32)
            out_v.append(m)
            out_i.append(a)
            for i in range(K):
                hit = (sv[i] == m[:, None]) & (si[i] == a[:, None])
                sv[i] = jnp.where(hit, _FLOOR, sv[i])
        vals_ref[...] = jnp.stack(out_v, axis=1)
        idx_ref[...] = jnp.stack(out_i, axis=1)


@functools.partial(jax.jit, static_argnames=("pad_id", "impl"))
def beam_topk(
    logits: jnp.ndarray,      # (B, K, V) fp32 raw decoder logits
    scores: jnp.ndarray,      # (B, K) fp32 running beam scores
    finished: jnp.ndarray,    # (B, K) bool
    *,
    pad_id: int = PAD_ID,
    impl: str = "auto",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-K next-beam candidates. Returns (top_scores (B,K) fp32 descending,
    flat_idx (B,K) int32 with flat = beam * V + token), identical to

        logp = log-softmax of logits, frozen rows replaced by the pad row
        lax.top_k((scores[..., None] + logp).reshape(B, K*V), K)

    computed in one streaming pass on TPU (`impl="pallas"`); `impl="xla"` is
    the reference path. "auto" picks pallas on TPU, xla elsewhere."""
    B, K, V = logits.shape
    logits = logits.astype(jnp.float32)
    scores = scores.astype(jnp.float32)
    lse = jax.scipy.special.logsumexp(logits, axis=-1)      # (B, K)
    finf = finished.astype(jnp.float32)
    base = scores - jnp.where(finf > 0, 0.0, lse)

    if impl == "auto":
        import os

        impl = os.environ.get("VAG_TOPK_IMPL", "")
        if impl not in ("xla", "pallas", "pallas_rows", "pallas_lanes"):
            # pallas_lanes beats XLA's fused TopK at small K (dispatch-
            # amortized on 1xv5e: 111 vs 142 us at B=128,K=5,V=8000; 66 vs
            # 136 at B=64; 208 vs 363 at V=16384) but its insertion cascade
            # scales ~K^2 and loses by K=12 (1334 vs 694 us) — select by K.
            impl = ("pallas_lanes"
                    if jax.default_backend() == "tpu" and K <= 8 else "xla")

    if impl == "xla":
        # Bitwise-identical candidate formula to the kernel:
        # (scores - lse) + logits, NOT scores + (logits - lse).
        vr = jnp.arange(V)[None, None, :]
        live = base[..., None] + logits
        froz = jnp.where(vr == pad_id, base[..., None],
                         base[..., None] + NEG_INF)
        cand = jnp.where(finished[..., None], froz, live).reshape(B, K * V)
        # Keep TopK reading a materialized buffer rather than re-fusing the
        # candidate generator into its passes (in-context difference is
        # within noise, but the barrier makes the cost model predictable).
        cand = jax.lax.optimization_barrier(cand)
        return jax.lax.top_k(cand, K)

    if impl == "pallas_lanes":
        tb = _pick_row_tile(B)
        tv = 512
        nv = -(-V // tv)
        # Per-row top-K from the lane-parallel kernel; same trivial (B, K*K)
        # cross-beam combine as pallas_rows.
        rvals, ridx = pl.pallas_call(
            functools.partial(_kernel_lanes, V=V, tv=tv, pad_id=pad_id, K=K),
            grid=(B // tb, nv),
            in_specs=[
                pl.BlockSpec((tb * K, tv), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tb * K, 1), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tb * K, 1), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((tb * K, K), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tb * K, K), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B * K, K), jnp.float32),
                jax.ShapeDtypeStruct((B * K, K), jnp.int32),
            ],
            scratch_shapes=([pltpu.VMEM((tb * K, 128), jnp.float32)] * K
                            + [pltpu.VMEM((tb * K, 128), jnp.int32)] * K),
            interpret=_interpret(),
        )(logits.reshape(B * K, V), base.reshape(B * K, 1),
          finf.reshape(B * K, 1))
        beam = jnp.arange(K, dtype=jnp.int32)[None, :, None]
        flat = (ridx.reshape(B, K, K) + beam * V).reshape(B, K * K)
        vals, pos = jax.lax.top_k(rvals.reshape(B, K * K), K)
        return vals, jnp.take_along_axis(flat, pos, axis=1)
    # gens 1-2 ("pallas", "pallas_rows") are BENCH-ONLY — they lose to XLA
    # and are kept as the measured record of the tuning path; see
    # ops/topk_legacy.py. Never chosen by "auto".
    from vag_nmt_tpu.ops.topk_legacy import legacy_beam_topk

    return legacy_beam_topk(logits, base, finf, finished,
                            V=V, pad_id=pad_id, impl=impl)
