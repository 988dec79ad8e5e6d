"""Fused Pallas TPU kernel for the teacher-forced decoder scan (SURVEY.md C8,
VERDICT r3 item 6).

`models/decoder.teacher_forced_logits` hoists every token-parallel GEMM out of
its `lax.scan`, but the scan body that remains — GRU1 cell, Bahdanau attention,
GRU2 cell, readout activation — still re-streams its loop-invariant operands
from HBM on EVERY one of the Tt time steps under XLA: the four recurrent
weight matrices (~14.5 MB fp32 at the 512-d configs) plus the per-sentence
attention context ctx/ctx_proj (~32 MB at IKEA shapes, B=64, T=128). At
Tt=128 that is ~6 GB of HBM traffic per forward scan for ~0.4 GFLOP/step of
actual math — the measured 11% train MFU at the IKEA config is that ratio.

This kernel owns the whole scan: grid (batch_tiles, Tt/KT) where the weights
(constant index maps) and the batch tile's ctx/ctx_proj (index maps constant
in the time dimension) are fetched into VMEM ONCE and stay resident across
every time step, while the per-step streams (precomputed GRU1 input gates and
readout y-terms in, readout activations and decoder states out) double-buffer
through the grid pipeline. KT time steps per grid step amortize the ~3.5 us
per-grid-step pipeline overhead (same lever as ops/pallas_gru.py).

Numerics policy (matches pallas_gru): all gate/attention/softmax math in fp32
in VMEM; MXU matmuls run in the stream dtype with fp32 accumulation; the
carried state is fp32 scratch. Under compute_dtype=float32 this is exactly
the XLA oracle's math modulo float association (parity-tested to 1e-5); under
bfloat16 the carried state is MORE precise than the oracle's bf16 scan carry.

The backward pass recomputes the step (attention included) from the saved
per-step states — memory-light, standard rematerialization — walking time in
reverse in a second kernel; weight gradients and the dctx/dctx_proj
accumulators stay fp32 in VMEM across the time grid per batch tile and reduce
over tiles outside. Public entry `pallas_decoder_scan` carries a custom VJP
so training runs through it (cfg.dec_scan_impl).

Bias folding: the attention bias ba is folded into ctx_proj and the readout
bias b into the y-term OUTSIDE the custom-VJP boundary (traced JAX), so their
gradients fall out of dctx_proj/dty automatically and the kernel signature
stays lean.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import PartitionSpec as P

from vag_nmt_tpu.ops.pallas_gru import (_SHARD_MESH, _pick_kt,
                                         gru_gate_algebra)
from vag_nmt_tpu.ops.pallas_topk import _interpret

NEG_INF = -1e9  # same constant as ops/attention.masked_softmax

# The fused step keeps ~14.5 MB of weights (fp32), the batch tile's
# ctx/ctx_proj, and (backward) an equal set of weight-grad accumulators plus
# fp32 dctx/dctx_proj accumulators resident in VMEM. 64 MB scoped budget as
# for pallas_gru (v5e VMEM is 128 MB; the cap bounds the scoped allocator
# only); _pick_tb sizes the batch tile against it.
_VMEM_CAP = 64 * 1024 * 1024
_VMEM_CAP_BWD = 112 * 1024 * 1024
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=_VMEM_CAP)
_COMPILER_PARAMS_BWD = pltpu.CompilerParams(vmem_limit_bytes=_VMEM_CAP_BWD)


def _pick_kt_bwd(Tt: int) -> int:
    """Backward time-block. The backward's in-register accumulators (weight
    grads + dctx/dctx_proj, ~15 MB at the 512-d configs) inflate Mosaic's
    stack allocation roughly linearly in the unroll factor, so the backward
    uses a shorter block than the forward's KT=8 (fwd/bwd grids need not
    match: the saved states are a global (Tt,B,H) array either way).
    VAG_DEC_KT_BWD overrides for A/B tuning."""
    import os

    env = os.environ.get("VAG_DEC_KT_BWD", "")
    if env:
        k = int(env)
        if Tt % k == 0:
            return k
    # kt=2 measured BOTH faster and smaller than kt=4 on the chip (m30k
    # tb=16: kt=2 beat kt=4; tb=32/kt=4 OOM'd at 123.7M while tb=32/kt=2
    # fit and was the fastest config at 1233 us) — Mosaic keeps each
    # unrolled step's temps (~3*tb*T*(A+C)*4 bytes) live concurrently, so
    # big unrolls trade VMEM for nothing once the pipeline is saturated.
    return 2 if Tt % 2 == 0 else 1


def _weight_bytes(H: int, A: int, C: int, R: int, itemsize: int) -> int:
    return (H * 3 * H * 2 + H * A + C * 3 * H + H * R + C * R) * itemsize


def _pick_tb(B: int, T: int, Tt: int, H: int, A: int, C: int, R: int,
             itemsize: int, *, backward: bool) -> int:
    """Largest batch tile whose estimated VMEM footprint fits the budget.

    The backward estimate is CALIBRATED against a measured Mosaic scoped
    allocation: m30k fp32 (T=32, H=A=512, C=1024, R=256) at tb=32/kt=4 used
    123.7 MB, and the decomposition below reproduces it to <1 MB — fixed
    terms (weights + fp32 grad accumulators + ctx/ctxp/dctx/dctxp tiles +
    double-buffered streams) ~51.6 MB plus ~18.9 MB per unrolled step:
    Mosaic keeps each unrolled step's live temps (the (tb,T,A) e/da arrays
    and two (tb,T,C)-sized attention products, ~3*tb*T*(A+C)*4 bytes)
    allocated concurrently rather than reusing one step's buffers for the
    next. An overflow is a Mosaic compile error, an undershoot only costs
    batch-tile parallelism, so the budget keeps an 8% headroom."""
    kt = _pick_kt_bwd(Tt) if backward else _pick_kt(Tt)
    w = _weight_bytes(H, A, C, R, itemsize)
    budget = int((_VMEM_CAP_BWD if backward else _VMEM_CAP) * 0.92)

    def est(tb):
        tile = tb * T * (C * itemsize + A * 4)            # ctx + ctx_proj
        streams = 2 * kt * tb * (3 * H + 2 * R + H) * itemsize
        if not backward:
            # Forward: one e (tb,T,A) + one (tb,T,C) product live at a time
            # (the fwd body's temps die step-to-step; verified by compiling
            # tb=32/kt=8 m30k fp32 under the real 64 MB cap). x1.3 margin.
            inter = tb * T * (A + C) * 4 * 2
            return int((w + tile + streams + inter) * 1.3)
        total = w + tile + streams
        total += _weight_bytes(H, A, C, R, 4)             # grad accumulators
        total += tb * T * (2 * C + A) * 4                 # dctx scr+out, dctxp
        total += 2 * kt * tb * (3 * H + 2 * R + H) * 4    # dty/dxg out streams
        total += kt * 3 * tb * T * (A + C) * 4            # per-step live temps
        return total

    # Mosaic needs the sublane (second-to-last) block dim divisible by 8 or
    # equal to the full array dim, so candidate tiles are >= 8; B itself is
    # always legal (full dim) and is the small-batch fallback.
    for tb in (128, 64, 32, 16, 8):
        if B % tb == 0 and est(tb) <= budget:
            return tb
    # Fallback MUST divide B: nb = B // tb silently drops the last
    # B % tb rows otherwise (uninitialized outputs AND gradients — caught
    # by review, regression-tested at B=12). The full-B block is always
    # Mosaic-legal (block dim == array dim); pallas_decoder_scan pads
    # B > 8 to a multiple of 8 first, so this triggers only at B < 8 or
    # when no dividing tile fits the budget (overflow is then a loud
    # Mosaic compile error, not silent corruption).
    return B


def _attend(ctxp, ctx, mask, q, va):
    """Masked Bahdanau attention for one step inside the kernel.

    ctxp (tb,T,A) f32 (bias folded), ctx (tb,T,C) stream dtype, mask (tb,T)
    f32, q (tb,A) f32, va (1,A) f32. Returns (c (tb,C) f32, w (tb,T) f32,
    e (tb,T,A) f32). The T-batched pieces run on the VPU (Mosaic's dot is
    2-D; a per-row (1,T)x(T,C) batched matmul would underfill the MXU
    anyway)."""
    e = jnp.tanh(ctxp + q[:, None, :])
    scores = jnp.sum(e * va[:, None, :], axis=-1)         # (tb,T)
    scores = jnp.where(mask > 0, scores, NEG_INF)
    w = jax.nn.softmax(scores, axis=-1)
    c = jnp.sum(w[:, :, None] * ctx, axis=1)              # f32 by promotion
    return c.astype(jnp.float32), w, e


# ---------------------------------------------------------------------------
# Forward. Grid (nb, Tt/KT): weights + the batch tile's ctx/ctx_proj stay in
# VMEM across the whole inner time loop; ty/xg1 stream in, t/s stream out.
# ---------------------------------------------------------------------------

def _fwd_kernel(ty_ref, xg_ref, s0_ref, ctx_ref, ctxp_ref, mask_ref,
                uh1_ref, bh1_ref, ua_ref, va_ref, wi2_ref, bi2_ref,
                uh2_ref, bh2_ref, ws_ref, wc_ref,
                t_ref, s_ref, s_scr, *, kt: int):
    tblk = pl.program_id(1)

    @pl.when(tblk == 0)
    def _():
        s_scr[:] = s0_ref[:]

    cdt = xg_ref.dtype
    s = s_scr[:]                                          # (tb,H) f32
    ctx = ctx_ref[:]
    ctxp = ctxp_ref[:]
    mask = mask_ref[:]
    uh1, ua, va = uh1_ref[:], ua_ref[:], va_ref[:]
    wi2, uh2 = wi2_ref[:], uh2_ref[:]
    ws, wc = ws_ref[:], wc_ref[:]
    bh1, bi2, bh2 = bh1_ref[:], bi2_ref[:], bh2_ref[:]    # (1, 3H) broadcast

    for j in range(kt):                                   # static unroll
        hg1 = jnp.dot(s.astype(cdt), uh1,
                      preferred_element_type=jnp.float32) + bh1
        _, _, _, s_til = gru_gate_algebra(xg_ref[j].astype(jnp.float32), hg1, s)
        q = jnp.dot(s_til.astype(cdt), ua,
                    preferred_element_type=jnp.float32)
        c, _, _ = _attend(ctxp, ctx, mask, q, va)
        xg2 = jnp.dot(c.astype(cdt), wi2,
                      preferred_element_type=jnp.float32) + bi2
        hg2 = jnp.dot(s_til.astype(cdt), uh2,
                      preferred_element_type=jnp.float32) + bh2
        _, _, _, s_new = gru_gate_algebra(xg2, hg2, s_til)
        t = jnp.tanh(
            ty_ref[j]
            + jnp.dot(s_new.astype(cdt), ws,
                      preferred_element_type=jnp.float32)
            + jnp.dot(c.astype(cdt), wc,
                      preferred_element_type=jnp.float32))
        t_ref[j] = t.astype(t_ref.dtype)
        s_ref[j] = s_new.astype(s_ref.dtype)
        s = s_new
    s_scr[:] = s


def _fwd_call(ty_t, xg_t, s0, ctx, ctxp, mask, uh1, bh1, ua, va,
              wi2, bi2, uh2, bh2, ws, wc):
    Tt, B, R = ty_t.shape
    H = uh1.shape[0]
    A = ua.shape[1]
    T, C = ctx.shape[1], ctx.shape[2]
    kt = _pick_kt(Tt)
    nt = Tt // kt
    tb = _pick_tb(B, T, Tt, H, A, C, R, xg_t.dtype.itemsize, backward=False)
    nb = B // tb

    def stream(shape):
        return pl.BlockSpec(shape, lambda i, t: (t, i, 0),
                            memory_space=pltpu.VMEM)

    def per_tile(shape, ndim3=True):
        if ndim3:
            return pl.BlockSpec(shape, lambda i, t: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec(shape, lambda i, t: (i, 0),
                            memory_space=pltpu.VMEM)

    def const(shape):
        return pl.BlockSpec(shape, lambda i, t: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_fwd_kernel, kt=kt),
        grid=(nb, nt),
        in_specs=[
            stream((kt, tb, R)),                 # ty
            stream((kt, tb, 3 * H)),             # xg1
            per_tile((tb, H), ndim3=False),      # s0
            per_tile((tb, T, C)),                # ctx
            per_tile((tb, T, A)),                # ctx_proj (+ba)
            per_tile((tb, T), ndim3=False),      # mask
            const((H, 3 * H)), const((1, 3 * H)),        # uh1, bh1
            const((H, A)), const((1, A)),                # ua, va
            const((C, 3 * H)), const((1, 3 * H)),        # wi2, bi2
            const((H, 3 * H)), const((1, 3 * H)),        # uh2, bh2
            const((H, R)), const((C, R)),                # ws, wc
        ],
        out_specs=[
            stream((kt, tb, R)),                 # t
            stream((kt, tb, H)),                 # s (residual)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tt, B, R), jnp.float32),
            jax.ShapeDtypeStruct((Tt, B, H), xg_t.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((tb, H), jnp.float32)],
        compiler_params=_COMPILER_PARAMS,
        interpret=_interpret(),
    )(ty_t, xg_t, s0, ctx, ctxp, mask, uh1, bh1, ua, va,
      wi2, bi2, uh2, bh2, ws, wc)


# ---------------------------------------------------------------------------
# Backward. Grid (nb, Tt/KT) walking time blocks in reverse scan order; the
# step is recomputed from the saved states (attention included), gradients
# for the weights and ctx/ctx_proj accumulate fp32 in VMEM per batch tile.
# ---------------------------------------------------------------------------

def _gru_bwd(dh_new, hg, h_prev, r, z, n):
    """Backward through one GRU cell (reset-after-matmul convention; same
    math as pallas_gru._bwd_kernel). Returns (dxg, dhg, dh_prev_cell)."""
    dn = dh_new * (1.0 - z)
    dz = dh_new * (h_prev - n)
    da_n = dn * (1.0 - n * n)
    dr = da_n * hg[:, 2 * hg.shape[1] // 3:]
    da_r = dr * r * (1.0 - r)
    da_z = dz * z * (1.0 - z)
    dxg = jnp.concatenate([da_r, da_z, da_n], axis=-1)
    dhg = jnp.concatenate([da_r, da_z, da_n * r], axis=-1)
    return dxg, dhg, dh_new * z


def _bwd_kernel(ty_ref, xg_ref, s0_ref, ctx_ref, ctxp_ref, mask_ref,
                uh1_ref, bh1_ref, ua_ref, va_ref, wi2_ref, bi2_ref,
                uh2_ref, bh2_ref, ws_ref, wc_ref,
                sblk_ref, sedge_ref, g_ref,
                dty_ref, dxg_ref, ds0_ref, dctx_ref, dctxp_ref,
                duh1_ref, dbh1_ref, dua_ref, dva_ref, dwi2_ref, dbi2_ref,
                duh2_ref, dbh2_ref, dws_ref, dwc_ref,
                ds_scr, dctx_scr, *, kt: int):
    k = pl.program_id(1)
    nt = pl.num_programs(1)

    @pl.when(k == 0)
    def _():
        ds_scr[:] = jnp.zeros_like(ds_scr)
        dctx_scr[:] = jnp.zeros_like(dctx_scr)
        dctxp_ref[:] = jnp.zeros_like(dctxp_ref)
        for ref in (duh1_ref, dbh1_ref, dua_ref, dva_ref, dwi2_ref,
                    dbi2_ref, duh2_ref, dbh2_ref, dws_ref, dwc_ref):
            ref[:] = jnp.zeros_like(ref)

    cdt = xg_ref.dtype
    H = ds_scr.shape[-1]
    ctx = ctx_ref[:]
    ctxp = ctxp_ref[:]
    mask = mask_ref[:]
    uh1, ua, va = uh1_ref[:], ua_ref[:], va_ref[:]
    wi2, uh2 = wi2_ref[:], uh2_ref[:]
    ws, wc = ws_ref[:], wc_ref[:]
    bh1, bi2, bh2 = bh1_ref[:], bi2_ref[:], bh2_ref[:]    # (1, 3H) broadcast

    ds = ds_scr[:]
    dctx_acc = dctx_scr[:]
    dctxp_acc = jnp.zeros_like(dctxp_ref)
    # Bias/va accumulators stay 2-D (1, X): reductions all use keepdims so
    # no 1-D vector layouts reach Mosaic's relayout pass.
    duh1 = jnp.zeros_like(duh1_ref[0])
    dbh1 = jnp.zeros_like(dbh1_ref[0])
    dua = jnp.zeros_like(dua_ref[0])
    dva = jnp.zeros_like(dva_ref[0])          # (tb, A) rows
    dwi2 = jnp.zeros_like(dwi2_ref[0])
    dbi2 = jnp.zeros_like(dbi2_ref[0])
    duh2 = jnp.zeros_like(duh2_ref[0])
    dbh2 = jnp.zeros_like(dbh2_ref[0])
    dws = jnp.zeros_like(dws_ref[0])
    dwc = jnp.zeros_like(dwc_ref[0])

    def dotT(a, b):          # a @ b^T via dot_general, no transpose
        return jax.lax.dot_general(a.astype(cdt), b, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    def outer(a, b):         # a^T @ b
        return jax.lax.dot_general(a.astype(cdt), b.astype(cdt),
                                   (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    for j in range(kt - 1, -1, -1):
        if j == 0:
            s_prev = jnp.where(k == nt - 1, s0_ref[:],
                               sedge_ref[0].astype(jnp.float32))
        else:
            s_prev = sblk_ref[j - 1].astype(jnp.float32)
        s_new = sblk_ref[j].astype(jnp.float32)

        # --- recompute the step (rematerialization) -----------------------
        xg1 = xg_ref[j].astype(jnp.float32)
        hg1 = jnp.dot(s_prev.astype(cdt), uh1,
                      preferred_element_type=jnp.float32) + bh1
        r1, z1, n1, s_til = gru_gate_algebra(xg1, hg1, s_prev)
        q = jnp.dot(s_til.astype(cdt), ua,
                    preferred_element_type=jnp.float32)
        c, w, e = _attend(ctxp, ctx, mask, q, va)
        xg2 = jnp.dot(c.astype(cdt), wi2,
                      preferred_element_type=jnp.float32) + bi2
        hg2 = jnp.dot(s_til.astype(cdt), uh2,
                      preferred_element_type=jnp.float32) + bh2
        r2, z2, n2, _ = gru_gate_algebra(xg2, hg2, s_til)
        t = jnp.tanh(
            ty_ref[j]
            + jnp.dot(s_new.astype(cdt), ws,
                      preferred_element_type=jnp.float32)
            + jnp.dot(c.astype(cdt), wc,
                      preferred_element_type=jnp.float32))

        # --- readout ------------------------------------------------------
        dpre = g_ref[j] * (1.0 - t * t)                   # (tb,R) f32
        dty_ref[j] = dpre.astype(dty_ref.dtype)
        ds_new = ds + dotT(dpre, ws)
        dc = dotT(dpre, wc)                               # (tb,C)
        dws += outer(s_new, dpre)
        dwc += outer(c, dpre)

        # --- GRU2 (h = s_til) ---------------------------------------------
        dxg2, dhg2, ds_til_cell = _gru_bwd(ds_new, hg2, s_til, r2, z2, n2)
        dc += dotT(dxg2, wi2)
        dwi2 += outer(c, dxg2)
        dbi2 += jnp.sum(dxg2, axis=0, keepdims=True)
        ds_til = ds_til_cell + dotT(dhg2, uh2)
        duh2 += outer(s_til, dhg2)
        dbh2 += jnp.sum(dhg2, axis=0, keepdims=True)

        # --- attention ------------------------------------------------------
        dw = jnp.sum(dc[:, None, :] * ctx, axis=-1).astype(jnp.float32)
        dctx_acc += w[:, :, None] * dc[:, None, :]
        dscores = w * (dw - jnp.sum(w * dw, axis=-1, keepdims=True))
        da = (dscores[:, :, None] * va[:, None, :]) * (1.0 - e * e)
        dctxp_acc += da                                   # (tb,T,A)
        dq = jnp.sum(da, axis=1)                          # (tb,A)
        dva += jnp.sum(e * dscores[:, :, None], axis=1)   # (tb, A) rows
        ds_til += dotT(dq, ua)
        dua += outer(s_til, dq)

        # --- GRU1 (h = s_prev) ----------------------------------------------
        dxg1, dhg1, ds_prev_cell = _gru_bwd(ds_til, hg1, s_prev, r1, z1, n1)
        dxg_ref[j] = dxg1.astype(dxg_ref.dtype)
        duh1 += outer(s_prev, dhg1)
        dbh1 += jnp.sum(dhg1, axis=0, keepdims=True)
        ds = ds_prev_cell + dotT(dhg1, uh1)

    ds_scr[:] = ds
    dctx_scr[:] = dctx_acc
    dctxp_ref[:] += dctxp_acc
    duh1_ref[0] += duh1
    dbh1_ref[0] += dbh1
    dua_ref[0] += dua
    dva_ref[0] += dva
    dwi2_ref[0] += dwi2
    dbi2_ref[0] += dbi2
    duh2_ref[0] += duh2
    dbh2_ref[0] += dbh2
    dws_ref[0] += dws
    dwc_ref[0] += dwc

    @pl.when(k == nt - 1)
    def _():
        ds0_ref[:] = ds
        dctx_ref[:] = dctx_scr[:].astype(dctx_ref.dtype)


def _bwd_call(res, g_t):
    (ty_t, xg_t, s0, ctx, ctxp, mask, uh1, bh1, ua, va,
     wi2, bi2, uh2, bh2, ws, wc, s_t) = res
    Tt, B, R = ty_t.shape
    H = uh1.shape[0]
    A = ua.shape[1]
    T, C = ctx.shape[1], ctx.shape[2]
    kt = _pick_kt_bwd(Tt)
    nt = Tt // kt
    tb = _pick_tb(B, T, Tt, H, A, C, R, xg_t.dtype.itemsize, backward=True)
    nb = B // tb

    # Backward grid step k visits time block nt-1-k; sedge is the saved state
    # at the scan-preceding position of the block's first step (clamped at
    # the boundary; the kernel substitutes s0 there).
    def bidx(k):
        return nt - 1 - k

    def stream(shape):
        return pl.BlockSpec(shape, lambda i, k: (bidx(k), i, 0),
                            memory_space=pltpu.VMEM)

    def per_tile(shape, nd=3):
        maps = {3: lambda i, k: (i, 0, 0), 2: lambda i, k: (i, 0)}
        return pl.BlockSpec(shape, maps[nd], memory_space=pltpu.VMEM)

    def const(shape):
        return pl.BlockSpec(shape, lambda i, k: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, kt=kt),
        grid=(nb, nt),
        in_specs=[
            stream((kt, tb, R)),                 # ty
            stream((kt, tb, 3 * H)),             # xg1
            per_tile((tb, H), nd=2),             # s0
            per_tile((tb, T, C)),                # ctx
            per_tile((tb, T, A)),                # ctx_proj (+ba)
            per_tile((tb, T), nd=2),             # mask
            const((H, 3 * H)), const((1, 3 * H)),
            const((H, A)), const((1, A)),
            const((C, 3 * H)), const((1, 3 * H)),
            const((H, 3 * H)), const((1, 3 * H)),
            const((H, R)), const((C, R)),
            stream((kt, tb, H)),                 # s block
            pl.BlockSpec((1, tb, H),             # s edge
                         lambda i, k: (jnp.maximum(bidx(k) * kt - 1, 0), i, 0),
                         memory_space=pltpu.VMEM),
            stream((kt, tb, R)),                 # g
        ],
        out_specs=[
            stream((kt, tb, R)),                 # dty
            stream((kt, tb, 3 * H)),             # dxg1
            per_tile((tb, H), nd=2),             # ds0
            per_tile((tb, T, C)),                # dctx
            per_tile((tb, T, A)),                # dctx_proj
            per_tile((1, H, 3 * H)),             # duh1
            per_tile((1, 1, 3 * H)),             # dbh1
            per_tile((1, H, A)),                 # dua
            per_tile((1, tb, A)),                # dva (rows)
            per_tile((1, C, 3 * H)),             # dwi2
            per_tile((1, 1, 3 * H)),             # dbi2
            per_tile((1, H, 3 * H)),             # duh2
            per_tile((1, 1, 3 * H)),             # dbh2
            per_tile((1, H, R)),                 # dws
            per_tile((1, C, R)),                 # dwc
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tt, B, R), jnp.float32),
            jax.ShapeDtypeStruct((Tt, B, 3 * H), xg_t.dtype),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            jax.ShapeDtypeStruct((B, T, C), ctx.dtype),
            jax.ShapeDtypeStruct((B, T, A), jnp.float32),
            jax.ShapeDtypeStruct((nb, H, 3 * H), jnp.float32),
            jax.ShapeDtypeStruct((nb, 1, 3 * H), jnp.float32),
            jax.ShapeDtypeStruct((nb, H, A), jnp.float32),
            jax.ShapeDtypeStruct((nb, tb, A), jnp.float32),
            jax.ShapeDtypeStruct((nb, C, 3 * H), jnp.float32),
            jax.ShapeDtypeStruct((nb, 1, 3 * H), jnp.float32),
            jax.ShapeDtypeStruct((nb, H, 3 * H), jnp.float32),
            jax.ShapeDtypeStruct((nb, 1, 3 * H), jnp.float32),
            jax.ShapeDtypeStruct((nb, H, R), jnp.float32),
            jax.ShapeDtypeStruct((nb, C, R), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tb, H), jnp.float32),
            pltpu.VMEM((tb, T, C), jnp.float32),
        ],
        compiler_params=_COMPILER_PARAMS_BWD,
        interpret=_interpret(),
    )(ty_t, xg_t, s0, ctx, ctxp, mask, uh1, bh1, ua, va,
      wi2, bi2, uh2, bh2, ws, wc, s_t, s_t, g_t)

    (dty, dxg, ds0, dctx, dctxp, duh1, dbh1, dua, dva, dwi2, dbi2,
     duh2, dbh2, dws, dwc) = outs
    # Cotangent dtypes must match the primal args (the weights travel in the
    # stream dtype); the wrapper's traced .astype(stream) casts carry the
    # grads back to the fp32 params.
    return (dty, dxg, ds0, dctx, dctxp, jnp.zeros_like(res[5]),
            duh1.sum(0).astype(uh1.dtype), dbh1[:, 0].sum(0),
            dua.sum(0).astype(ua.dtype), dva.sum((0, 1)),
            dwi2.sum(0).astype(wi2.dtype), dbi2[:, 0].sum(0),
            duh2.sum(0).astype(uh2.dtype), dbh2[:, 0].sum(0),
            dws.sum(0).astype(ws.dtype), dwc.sum(0).astype(wc.dtype))


# ---------------------------------------------------------------------------
# Public entry with custom VJP
# ---------------------------------------------------------------------------

@jax.custom_vjp
def _scan(ty_t, xg_t, s0, ctx, ctxp, mask, uh1, bh1, ua, va,
          wi2, bi2, uh2, bh2, ws, wc):
    return _fwd_call(ty_t, xg_t, s0, ctx, ctxp, mask, uh1, bh1, ua, va,
                     wi2, bi2, uh2, bh2, ws, wc)[0]


def _scan_fwd(*args):
    t_t, s_t = _fwd_call(*args)
    return t_t, args + (s_t,)


def _scan_bwd(res, g_t):
    return _bwd_call(res, g_t.astype(jnp.float32))


_scan.defvjp(_scan_fwd, _scan_bwd)


def _sharded_scan(mesh, args):
    """Data-parallel wrapper (same contract as pallas_gru._sharded_scan):
    batch rows split over 'data', weights replicated; shard_map's transpose
    all-reduces the replicated-input grads."""
    from vag_nmt_tpu.parallel.sharding import DATA_AXIS

    B = args[2].shape[0]
    n_data = mesh.shape[DATA_AXIS]
    if B % n_data:
        raise ValueError(
            f"pallas decoder scan under a mesh needs batch divisible by the "
            f"'data' axis (batch {B}, data {n_data})")
    tspec = P(None, DATA_AXIS, None)     # (Tt, B, *) streams
    bspec3 = P(DATA_AXIS, None, None)    # (B, T, *)
    bspec2 = P(DATA_AXIS, None)          # (B, *)
    wspec = P()
    in_specs = (tspec, tspec, bspec2, bspec3, bspec3, bspec2) + (wspec,) * 10
    return jax.shard_map(
        lambda *a: _scan(*a), mesh=mesh,
        in_specs=in_specs, out_specs=tspec, check_vma=False,
    )(*args)


def pallas_decoder_scan(
    params: Dict[str, Any],
    ty: jnp.ndarray,          # (B, Tt, R) f32 readout y-term (y @ wy)
    xg1: jnp.ndarray,         # (B, Tt, 3H) f32 GRU1 input gates
    s0: jnp.ndarray,          # (B, H)
    ctx: jnp.ndarray,         # (B, T, C)
    ctx_proj: jnp.ndarray,    # (B, T, A) f32 from precompute_ctx_proj
    src_mask: jnp.ndarray,    # (B, T)
) -> jnp.ndarray:
    """Drop-in for teacher_forced_logits' lax.scan: the fused GRU1 ->
    attention -> GRU2 -> readout recurrence over all Tt steps. Returns the
    readout activations t_all (B, Tt, R) fp32 (pre-dropout, pre vocab GEMM).

    Stream dtype follows pallas_gru: under bfloat16 compute the big time
    streams and resident weights travel bf16 (VAG_GRU_STREAM=fp32 forces
    fp32); gate/attention math and the carried state are always fp32."""
    import os

    mesh = _SHARD_MESH.get()
    from vag_nmt_tpu.parallel.sharding import DATA_AXIS

    sharded = (mesh is not None and DATA_AXIS in mesh.shape
               and mesh.shape[DATA_AXIS] > 1)
    n_data = mesh.shape[DATA_AXIS] if sharded else 1

    # Batch tiles inside the kernel must divide the (per-shard) batch
    # (_pick_tb): pad B so each shard's local rows are a multiple of 8
    # (edge-replicated rows — finite math, identical to a real row; padded
    # outputs are sliced off, so their cotangents are zero and gradients
    # stay exact). Without this, an odd local batch falls back to one
    # full-B VMEM block (or, before the review fix, silently dropped the
    # tail rows).
    B = ty.shape[0]
    if sharded and B % n_data == 0:
        local = B // n_data
        pad = ((-local) % 8) * n_data if local > 8 else 0
    else:
        pad = (-B) % 8 if B > 8 else 0
    if pad:
        def edge(x):
            widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(x, widths, mode="edge")

        ty, xg1, s0 = edge(ty), edge(xg1), edge(s0)
        ctx, ctx_proj, src_mask = edge(ctx), edge(ctx_proj), edge(src_mask)

    r, at = params["readout"], params["attn"]
    g1, g2 = params["gru1"], params["gru2"]
    cdt = ctx.dtype
    stream = (jnp.bfloat16
              if (cdt == jnp.bfloat16
                  and os.environ.get("VAG_GRU_STREAM", "") != "fp32")
              else jnp.float32)

    # Bias folding (see module docstring): grads for ba / b fall out of the
    # dctx_proj / dty sums in this traced prologue.
    ty_t = (jnp.swapaxes(ty, 0, 1) + r["b"]).astype(jnp.float32)
    ctxpb = (ctx_proj + at["ba"]).astype(jnp.float32)
    xg_t = jnp.swapaxes(xg1, 0, 1).astype(stream)
    f32 = jnp.float32
    args = (ty_t, xg_t, s0.astype(f32), ctx, ctxpb,
            src_mask.astype(f32),
            g1["uh"].astype(stream), g1["bh"].astype(f32).reshape(1, -1),
            at["ua"].astype(stream), at["va"].astype(f32).reshape(1, -1),
            g2["wi"].astype(stream), g2["bi"].astype(f32).reshape(1, -1),
            g2["uh"].astype(stream), g2["bh"].astype(f32).reshape(1, -1),
            r["ws"].astype(stream), r["wc"].astype(stream))

    if sharded:
        t_t = _sharded_scan(mesh, args)
    else:
        t_t = _scan(*args)
    t_all = jnp.swapaxes(t_t, 0, 1)
    return t_all[:B] if pad else t_all
