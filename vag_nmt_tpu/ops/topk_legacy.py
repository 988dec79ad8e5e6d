"""BENCH-ONLY legacy top-k kernels — generations 1 and 2 of the tuning path
(VERDICT r2 item 9: out of the production module).

Both LOSE to XLA's fused TopK on v5e (gen 1 "pallas": 702 us, gen 2
"pallas_rows": 522 us vs XLA 243 us at B=128, K=5, V=8000 with the round-1
harness; the production gen-3 lane-parallel kernel lives in
ops/pallas_topk.py). Kept importable because (a) benchmarks/topk_bench.py
still measures them as the record of WHY the lane-parallel layout wins, and
(b) their parity tests pin the candidate semantics from three independent
implementations. Never selected by impl="auto".
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vag_nmt_tpu.ops.pallas_topk import NEG_INF, _FLOOR, _interpret


def _kernel(logits_ref, base_ref, fin_ref, vals_ref, idx_ref,
            run_vals, run_idx, *, V: int, tv: int, pad_id: int, K: int):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        run_vals[:] = jnp.full_like(run_vals, _FLOOR)
        run_idx[:] = jnp.zeros_like(run_idx)

    blk = logits_ref[...]                       # (tb, K, tv)
    tb = blk.shape[0]
    base = base_ref[...]                        # (tb, K)
    fin = fin_ref[...]                          # (tb, K) float 0/1

    vglob = j * tv + jax.lax.broadcasted_iota(jnp.int32, (tb, K, tv), 2)
    # candidate scores; out-of-range vocab lanes (last partial block) floored
    live = base[:, :, None] + blk
    froz = jnp.where(vglob == pad_id, base[:, :, None],
                     base[:, :, None] + NEG_INF)
    cand = jnp.where(fin[:, :, None] > 0, froz, live)
    cand = jnp.where(vglob < V, cand, _FLOOR)

    # Mosaic-friendly argmax: max-reduce, then min-reduce the iota over
    # value-matching positions (first-occurrence tie-break, like argmax).
    kiota = jax.lax.broadcasted_iota(jnp.int32, (tb, K, tv), 1)
    viota = jax.lax.broadcasted_iota(jnp.int32, (tb, K, tv), 2)
    kio2 = jax.lax.broadcasted_iota(jnp.int32, (tb, K), 1)
    BIG = jnp.int32(2**30)

    # K extract-max rounds over the block -> block-local top-K
    bvals = []
    bidx = []
    for _ in range(K):
        mv = jnp.max(cand, axis=2)                         # (tb, K)
        av = jnp.min(jnp.where(cand == mv[:, :, None], viota, BIG),
                     axis=2).astype(jnp.int32)             # (tb, K)
        m = jnp.max(mv, axis=1)                            # (tb,)
        ks = jnp.min(jnp.where(mv == m[:, None], kio2, BIG),
                     axis=1).astype(jnp.int32)             # (tb,)
        sel = kio2 == ks[:, None]
        vs = jnp.sum(jnp.where(sel, av, 0), axis=1)        # (tb,)
        bvals.append(m)
        bidx.append(ks * V + j * tv + vs)
        hit = (kiota == ks[:, None, None]) & (viota == vs[:, None, None])
        cand = jnp.where(hit, _FLOOR, cand)
    blk_vals = jnp.stack(bvals, axis=1)                    # (tb, K)
    blk_idx = jnp.stack(bidx, axis=1)                      # (tb, K)

    # Merge running top-K with block top-K. Running entries are listed first,
    # so the first-occurrence tie-break prefers earlier vocab blocks.
    allv = jnp.concatenate([run_vals[...], blk_vals], axis=1)   # (tb, 2K)
    alli = jnp.concatenate([run_idx[...], blk_idx], axis=1)
    nvals = []
    nidx = []
    pos = jax.lax.broadcasted_iota(jnp.int32, allv.shape, 1)
    for _ in range(K):
        m = jnp.max(allv, axis=1)
        a = jnp.min(jnp.where(allv == m[:, None], pos, BIG),
                    axis=1).astype(jnp.int32)              # (tb,)
        sel = pos == a[:, None]
        nvals.append(m)
        nidx.append(jnp.sum(jnp.where(sel, alli, 0), axis=1))
        allv = jnp.where(sel, _FLOOR, allv)
    run_vals[:] = jnp.stack(nvals, axis=1)
    run_idx[:] = jnp.stack(nidx, axis=1)

    vals_ref[...] = run_vals[...]
    idx_ref[...] = run_idx[...]


def _kernel_rows(logits_ref, base_ref, fin_ref, vals_ref, idx_ref,
                 run_vals, run_idx, *, V: int, tv: int, pad_id: int, K: int):
    """Row-major layout: candidates live in (tb*K, tv) 2-D tiles with FULL
    sublane utilization — the 3-D (tb, K, tv) layout pads K=5 up to 8
    sublanes and burns ~1.6x the vector registers. Every operation here is
    per-ROW ((sentence, beam) pairs are independent): K extract-max rounds
    over the block, then a (R, 2K) merge with the per-row running top-K.
    The tiny cross-beam merge (K*K -> K per sentence) happens OUTSIDE in
    XLA — Mosaic cannot shape-cast (tb*K, K) -> (tb, K*K) vectors."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        run_vals[:] = jnp.full_like(run_vals, _FLOOR)
        run_idx[:] = jnp.zeros_like(run_idx)

    blk = logits_ref[...]                        # (R, tv), R = tb*K
    R = blk.shape[0]
    base = base_ref[...]                         # (R, 1)
    fin = fin_ref[...]                           # (R, 1)

    vglob = j * tv + jax.lax.broadcasted_iota(jnp.int32, (R, tv), 1)
    live = base + blk
    froz = jnp.where(vglob == pad_id, base, base + NEG_INF)
    cand = jnp.where(fin > 0, froz, live)
    cand = jnp.where(vglob < V, cand, _FLOOR)

    viota = jax.lax.broadcasted_iota(jnp.int32, (R, tv), 1)
    BIG = jnp.int32(2**30)

    # K extract-max rounds per row -> (R, K) block-local top-K. Ties pick
    # the smaller vocab index (min-iota), like lax.top_k.
    rvals = []
    ridx = []
    for _ in range(K):
        m = jnp.max(cand, axis=1)                             # (R,)
        a = jnp.min(jnp.where(cand == m[:, None], viota, BIG),
                    axis=1).astype(jnp.int32)                 # (R,)
        rvals.append(m)
        ridx.append(j * tv + a)                               # global vocab id
        cand = jnp.where(viota == a[:, None], _FLOOR, cand)
    blk_vals = jnp.stack(rvals, axis=1)                       # (R, K)
    blk_idx = jnp.stack(ridx, axis=1)

    # Merge with the per-row running top-K; running entries first so earlier
    # vocab blocks win ties.
    allv = jnp.concatenate([run_vals[...], blk_vals], axis=1)  # (R, 2K)
    alli = jnp.concatenate([run_idx[...], blk_idx], axis=1)
    pos = jax.lax.broadcasted_iota(jnp.int32, allv.shape, 1)
    nvals = []
    nidx = []
    for _ in range(K):
        m = jnp.max(allv, axis=1)
        a = jnp.min(jnp.where(allv == m[:, None], pos, BIG),
                    axis=1).astype(jnp.int32)
        sel = pos == a[:, None]
        nvals.append(m)
        nidx.append(jnp.sum(jnp.where(sel, alli, 0), axis=1))
        allv = jnp.where(sel, _FLOOR, allv)
    run_vals[:] = jnp.stack(nvals, axis=1)
    run_idx[:] = jnp.stack(nidx, axis=1)

    vals_ref[...] = run_vals[...]
    idx_ref[...] = run_idx[...]



def legacy_beam_topk(logits, base, finf, finished, *, V, pad_id, impl):
    """Dispatch for the two legacy kernels; called from
    ops/pallas_topk.beam_topk when impl is explicitly "pallas"/"pallas_rows".
    `base`/`finf` are beam_topk's precomputed candidate terms."""
    B, K = base.shape[0], base.shape[1]
    from vag_nmt_tpu.ops.pallas_topk import _pick_row_tile

    tb = _pick_row_tile(B)
    tv = 512
    nv = -(-V // tv)
    if impl == "pallas_rows":
        # Kernel returns per-ROW top-K (R = B*K rows); the K*K -> K
        # per-sentence combine is a trivial (B, K*K) lax.top_k in XLA.
        rvals, ridx = pl.pallas_call(
            functools.partial(_kernel_rows, V=V, tv=tv, pad_id=pad_id, K=K),
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
            scratch_shapes=[pltpu.VMEM((tb * K, K), jnp.float32),
                            pltpu.VMEM((tb * K, K), jnp.int32)],
            interpret=_interpret(),
        )(logits.reshape(B * K, V), base.reshape(B * K, 1),
          finf.reshape(B * K, 1))
        # beam-major candidate order -> top_k's first-occurrence tie-break
        # prefers the lower beam, matching the 3-D kernel's rule
        beam = jnp.arange(K, dtype=jnp.int32)[None, :, None]
        flat = (ridx.reshape(B, K, K) + beam * V).reshape(B, K * K)
        vals, pos = jax.lax.top_k(rvals.reshape(B, K * K), K)
        return vals, jnp.take_along_axis(flat, pos, axis=1)
    vals, idx = pl.pallas_call(
        functools.partial(_kernel, V=V, tv=tv, pad_id=pad_id, K=K),
        grid=(B // tb, nv),
        in_specs=[
            pl.BlockSpec((tb, K, tv), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, K), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, K), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tb, K), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, K), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, K), jnp.float32),
            jax.ShapeDtypeStruct((B, K), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((tb, K), jnp.float32),
                        pltpu.VMEM((tb, K), jnp.int32)],
        interpret=_interpret(),
    )(logits, base, finf)
    return vals, idx
