"""Fused beam decode-step kernel: GRU1 -> attention -> GRU2 -> readout.

The decode hot loop's mid-section (models/decoder._beams_step_core between
the per-vocab table gather and the fused readout->top-k kernel) is, under
XLA, a chain of small ops whose dominant cost is not FLOPs but the
materialized attention broadcast: `bahdanau_attend_beams_q` builds a
(B, K, T, A) tanh intermediate (~21 MB at flagship B=128, K=5, T=32,
A=512 — benchmarks/decode_bench.py T3 measured the w_s GEMM + attention
at ~57 us/step of the ~170 us production body). This kernel computes the
whole mid-section for a sentence tile in one pass with every intermediate
VMEM-resident: the (tb, T, A) attention tensor exists once per beam and
never touches HBM.

Same per-column dot products as the XLA tabled path (models/decoder.py
`_beams_step_core` with tables: the fused w_s = [ua|uh2] and
w_c = [wx2|wc] GEMMs, f32 accumulation), same gate algebra as ops/gru
`gru_cell_from_gates`, same masked softmax as ops/attention — but NOT
bit-identical (softmax/tanh reassociation differs), so the decode program
factories key the selection env (VAG_DEC_STEP) into their cache
fingerprint and the parity tests assert closeness plus unchanged
architecture invariants rather than exactness vs the XLA step.

Forward-only by design: beam search never differentiates. Reference
behavior being replaced: the per-step PyTorch decoder call chain in the
reference's beam loop (SURVEY.md C8/C12 — per-step cuDNN GRU cells +
attention MLP with host-driven bookkeeping).

Grid: 1-D over sentence tiles (ctx/ctx_proj stream per SENTENCE, the
beam axis lives inside the tile — K-fold less HBM traffic, same as the
XLA beam path's broadcast, but without the HBM-materialized (B,K,T,A)).
Weights ride constant index maps, so they stay VMEM-resident across grid
steps of ONE kernel call; across while_loop iterations they re-stream
(~7.5 MB bf16, ~9 us at HBM speed — the irreducible per-step cost).
"""

from __future__ import annotations

import functools
import os
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jax.sharding import PartitionSpec as P

from vag_nmt_tpu.ops.pallas_gru import _SHARD_MESH, gru_gate_algebra
from vag_nmt_tpu.ops.pallas_topk import _interpret

NEG_INF = -1e9  # ops/attention.masked_softmax's constant

_VMEM_CAP = 100 * 1024 * 1024
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=_VMEM_CAP)


def use_dec_step_kernel() -> bool:
    """Default OFF — a MEASURED negative (benchmarks/dec_step_bench.py,
    1xv5e, interleaved legs, gather included in both):

        shape                bf16 xla/kernel us   fp32 xla/kernel us
        m30k  B128 K5 T32      104.3 / 120.7        73.9 / 124.8
        m30k  B128 K5 T16       95.5 /  99.1        67.5 / 111.3
        ikea  B128 K5 T128     151.7 / 302.5       109.7 / 317.6

    Why it loses (and keeps losing as T grows): the step's heavy tensors
    are the attention reductions scores=e.va and c=w.ctx, which XLA lowers
    as batched MXU matmuls (einsum bkt,btc->bkc); Mosaic's dot is 2-D, so
    the kernel computes them as VPU multiply-reduces — at T=128 that is
    4x the VPU work of T=32 and the kernel is 2x slower than XLA. The
    avoided (B,K,T,A) HBM round trip does not pay for leaving the MXU.
    Kept as an A/B-able artifact (VAG_DEC_STEP=on), keyed into translate's
    program-cache fingerprint; the tests force it on in interpret mode."""
    env = os.environ.get("VAG_DEC_STEP", "").lower()
    if env in ("on", "1", "true"):
        return True
    return False


def dec_step_shapes_supported(H: int, A: int, C: int, R: int,
                              interpret: bool | None = None) -> bool:
    """Real-Mosaic support envelope for the kernel.

    The kernel was built and chip-validated at lane-aligned flagship dims
    (H=A=R=512, C=1024). At sub-lane dims the TPU-compiled kernel HANGS on
    device (reproduced 2026-08-19: toy-preset CLI translate with
    VAG_DEC_STEP=on blocks forever in device_get; a direct micro-call at
    H=A=32, C=64 never completes either) — so even with the env forced on,
    the decode step falls back to XLA outside this envelope. Interpret
    mode (the CPU test path) has no tiling and stays permissive."""
    if interpret is None:
        interpret = _interpret()
    if interpret:
        return True
    return all(d % 128 == 0 for d in (H, A, C, R))


def _gru_gates(xg, hg, h):
    """pallas_gru.gru_gate_algebra (f32 gate math), state dtype preserved
    (the decode loop carries bf16 states under bf16 compute)."""
    _, _, _, h_new = gru_gate_algebra(xg, hg, h.astype(jnp.float32))
    return h_new.astype(h.dtype)


def _kernel(gy_ref, s_ref, ctx_ref, ctxp_ref, mask_ref,
            uh1_ref, bh1_ref, w_s_ref, bh2_ref, va_ref,
            w_c_ref, bi2_ref, ws_ref, br_ref,
            s_out_ref, t_out_ref, *, K: int, H: int, A: int):
    cdt = s_ref.dtype
    tb = s_ref.shape[0]
    n = tb * K
    G3 = 3 * H

    s = s_ref[:].reshape(n, H)
    gy = gy_ref[:].reshape(n, gy_ref.shape[-1])
    xg1, ty = gy[:, :G3], gy[:, G3:]

    # GRU1: hidden gates + cell (xg1 from the table already carries bi1).
    hg1 = jnp.dot(s, uh1_ref[:],
                  preferred_element_type=jnp.float32) + bh1_ref[:]
    s_til = _gru_gates(xg1, hg1, s)

    # Fused attention-query + GRU2 hidden gates (w_s = [ua | uh2]).
    qh = jnp.dot(s_til, w_s_ref[:], preferred_element_type=jnp.float32)
    q = qh[:, :A].reshape(tb, K, A)
    hg2 = qh[:, A:] + bh2_ref[:]

    # Bahdanau attention, beam-shared ctx; the (tb, T, A) tanh intermediate
    # lives once per beam in VMEM (vs a (B, K, T, A) HBM tensor under XLA).
    ctx = ctx_ref[:]
    ctxp = ctxp_ref[:]                               # f32, ba folded
    mask = mask_ref[:]
    va = va_ref[:]
    cs = []
    for k in range(K):
        e = jnp.tanh(ctxp + q[:, k, :][:, None, :])  # (tb, T, A) f32
        sc = jnp.sum(e * va[:, None, :], axis=-1)    # (tb, T)
        sc = jnp.where(mask > 0, sc, NEG_INF)
        w = jax.nn.softmax(sc, axis=-1)
        c_k = jnp.sum(w[:, :, None] * ctx, axis=1)   # f32 by promotion
        cs.append(c_k.astype(cdt)[:, None, :])
    c = jnp.concatenate(cs, axis=1).reshape(n, ctx.shape[-1])

    # Fused GRU2 input gates + readout c-term (w_c = [wx2 | wc]).
    xc = jnp.dot(c, w_c_ref[:], preferred_element_type=jnp.float32)
    s_new = _gru_gates(xc[:, :G3] + bi2_ref[:], hg2, s_til)
    t = jnp.tanh(
        ty
        + jnp.dot(s_new, ws_ref[:], preferred_element_type=jnp.float32)
        + xc[:, G3:]
        + br_ref[:]
    )
    s_out_ref[:] = s_new.reshape(tb, K, H)
    t_out_ref[:] = t.reshape(tb, K, t.shape[-1])


def _pick_tb(B: int, K: int, T: int, C: int, A: int, H: int, R: int,
             itemsize: int) -> int:
    """Sentence-tile size against the VMEM budget. Mosaic may keep the
    K unrolled attention temps live concurrently (the pallas_dec_scan
    backward lesson), so the estimate charges all K of them."""
    w = (H * 3 * H + H * (A + 3 * H) + C * (3 * H + R) + H * R) * itemsize

    def est(tb):
        n = tb * K
        tile = tb * T * (C * itemsize + A * 4 + 4)   # ctx + ctxp + mask
        rows = n * ((3 * H + R) * 4 + H * itemsize   # gy + s in
                    + H * itemsize + R * 4)          # s_new + t out
        temps = K * tb * T * (A + C) * 4             # e + w*ctx per beam
        acts = n * (3 * H + A + 3 * H + C + 3 * H + R) * 4
        return int((w + tile + rows + temps + acts) * 1.25)

    budget = int(_VMEM_CAP * 0.9)
    for tb in (128, 64, 32, 16, 8):
        if B % tb == 0 and est(tb) <= budget:
            return tb
    # Fallback MUST divide B: a non-dividing tile makes the grid (B // tb)
    # silently skip the last B % tb rows (their outputs stay uninitialized
    # — caught by review, regression-tested at B=12). The full-B tile is
    # always Mosaic-legal (block dim == full array dim); _call pads B > 8
    # to a multiple of 8 first, so this only triggers at B < 8 or when no
    # dividing tile fits the budget (where overflow is a loud compile
    # error, not corruption).
    return B


def pallas_decode_step(
    params: Dict[str, Any],
    tables: Dict[str, jnp.ndarray],
    tok: jnp.ndarray,        # (B, K) int32 previous tokens
    s: jnp.ndarray,          # (B, K, H)
    ctx: jnp.ndarray,        # (B, T, C)
    ctx_proj: jnp.ndarray,   # (B, T, A) f32
    src_mask: jnp.ndarray,   # (B, T)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One fused beam decode step off the per-vocab tables.

    Returns (s_new (B, K, H) state dtype, t (B*K, R) f32 readout
    activations — the inputs the fused readout->top-k kernel takes).
    The gy table row gather stays in XLA (dynamic-index gather; measured
    ~15 us and not a kernel win candidate)."""
    B, K = tok.shape
    H = s.shape[-1]
    T, C = ctx.shape[1], ctx.shape[2]
    A = params["attn"]["ua"].shape[1]
    G = tables["gy"].shape[-1]
    R = G - 3 * H

    gy = jnp.take(tables["gy"], tok.reshape(-1), axis=0).reshape(B, K, G)
    ctxpb = (ctx_proj + params["attn"]["ba"]).astype(jnp.float32)

    mesh = _SHARD_MESH.get()
    if mesh is not None:
        # GSPMD cannot partition a custom call: under a mesh the kernel is
        # shard_map'ed over 'data' (batch rows split, weights replicated) —
        # same composition as pallas_gru/pallas_dec_scan. Forward-only, so
        # no transpose/all-reduce concerns.
        from vag_nmt_tpu.parallel.sharding import DATA_AXIS

        n_data = mesh.shape[DATA_AXIS]
        if B % n_data:
            raise ValueError(
                f"pallas decode step under a mesh needs batch divisible by "
                f"the 'data' axis (batch {B}, data {n_data})")
        b3 = P(DATA_AXIS, None, None)
        b2 = P(DATA_AXIS, None)
        s_new, t = jax.shard_map(
            lambda *a: _call(params, tables, *a, K=K, H=H, A=A, R=R),
            mesh=mesh,
            in_specs=(b3, b3, b3, b3, b2),
            out_specs=(b3, b3),
            check_vma=False,
        )(gy, s, ctx, ctxpb, src_mask.astype(jnp.float32))
        return s_new, t.reshape(B * K, R)
    s_new, t = _call(params, tables, gy, s, ctx, ctxpb,
                     src_mask.astype(jnp.float32), K=K, H=H, A=A, R=R)
    return s_new, t.reshape(B * K, R)


def _call(params, tables, gy, s, ctx, ctxpb, mask, *, K, H, A, R):
    B = s.shape[0]
    # Batch tiles must divide B (see _pick_tb). B > 8 that is not a
    # multiple of 8 (e.g. an odd decode_batch_size, or a mesh shard's
    # local rows) is padded up with replicated edge rows — finite math,
    # outputs sliced back — so the kernel still gets an sublane-aligned
    # tile instead of falling back to one full-B block.
    pad = (-B) % 8 if B > 8 else 0
    if pad:
        def edge(x):
            widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(x, widths, mode="edge")

        s_new, t = _call(params, tables, edge(gy), edge(s), edge(ctx),
                         edge(ctxpb), edge(mask), K=K, H=H, A=A, R=R)
        return s_new[:B], t[:B]
    T, C = ctx.shape[1], ctx.shape[2]
    G = gy.shape[-1]
    g1, g2, r = params["gru1"], params["gru2"], params["readout"]

    tb = _pick_tb(B, K, T, C, A, H, R, s.dtype.itemsize)
    nb = B // tb

    def tile3(shape):
        return pl.BlockSpec(shape, lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def tile2(shape):
        return pl.BlockSpec(shape, lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def const(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    s_new, t = pl.pallas_call(
        functools.partial(_kernel, K=K, H=H, A=A),
        grid=(nb,),
        in_specs=[
            tile3((tb, K, G)),                       # gy rows
            tile3((tb, K, H)),                       # s
            tile3((tb, T, C)),                       # ctx
            tile3((tb, T, A)),                       # ctx_proj + ba
            tile2((tb, T)),                          # src_mask
            const((H, 3 * H)), const((1, 3 * H)),    # uh1, bh1
            const((H, A + 3 * H)), const((1, 3 * H)),  # w_s, bh2
            const((1, A)),                           # va
            const((C, G)), const((1, 3 * H)),        # w_c, bi2
            const((H, R)), const((1, R)),            # ws, b
        ],
        out_specs=[tile3((tb, K, H)), tile3((tb, K, R))],
        out_shape=[
            jax.ShapeDtypeStruct((B, K, H), s.dtype),
            jax.ShapeDtypeStruct((B, K, R), jnp.float32),
        ],
        compiler_params=_COMPILER_PARAMS,
        interpret=_interpret(),
    )(
        gy, s, ctx, ctxpb, mask,
        g1["uh"], g1["bh"].astype(jnp.float32).reshape(1, -1),
        tables["w_s"], g2["bh"].astype(jnp.float32).reshape(1, -1),
        params["attn"]["va"].astype(jnp.float32).reshape(1, -1),
        tables["w_c"], g2["bi"].astype(jnp.float32).reshape(1, -1),
        r["ws"], r["b"].astype(jnp.float32).reshape(1, -1),
    )
    return s_new, t
