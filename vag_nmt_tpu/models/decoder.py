"""Conditional-GRU attention decoder (SURVEY.md C8).

dl4mt-style two-cell step: GRU1 on the target embedding, masked Bahdanau
attention queried by the intermediate state, GRU2 on the attention context,
then a tanh readout -> vocab logits. [LOW-CONF on the reference's exact
readout (maxout?) — mount empty this session; tanh readout chosen.]

TPU-first details:
- every non-recurrent GEMM moves out of the teacher-forced scan: the GRU1
  input gates and the readout y-term are time-parallel matmuls BEFORE it,
  and the (R, V) vocab projection is ONE (B*Tt, R) matmul AFTER it (the
  scan emits readout activations, not logits);
- the attention context projection is precomputed once per sentence;
- the same `step_acts_from_xgates` recurrent body is used by the training
  scan and (via `_beams_step_core`'s fused variant, parity-tested) the
  decode loops, so train/decode numerics agree by construction;
- logits accumulate in fp32 regardless of compute dtype.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from vag_nmt_tpu.core.config import ModelConfig
from vag_nmt_tpu.core.rng import key_for
from vag_nmt_tpu.models.layers import dropout, embed, init_dense, init_embedding
from vag_nmt_tpu.ops.attention import (
    bahdanau_attend,
    bahdanau_attend_beams,
    bahdanau_attend_beams_q,
    init_attention_params,
    precompute_ctx_proj,
)
from vag_nmt_tpu.ops.gru import (
    gru_cell_from_gates,
    gru_cell_from_xgates,
    gru_gates_from_x,
    init_gru_params,
)


def init_decoder(key: jax.Array, cfg: ModelConfig) -> Dict[str, Any]:
    H, C, E, R = cfg.dec_hidden_dim, cfg.ctx_dim, cfg.emb_dim, cfg.emb_dim
    p: Dict[str, Any] = {
        "embed": init_embedding(key, cfg.tgt_vocab_size, E, "decoder/embed"),
        "gru1": init_gru_params(key, E, H, "decoder/gru1"),
        "attn": init_attention_params(key, C, H, cfg.attn_dim, "decoder/attn"),
        "gru2": init_gru_params(key, C, H, "decoder/gru2"),
        "readout": {
            "wy": init_dense(key, E, R, "decoder/readout/wy")["w"],
            "ws": init_dense(key, H, R, "decoder/readout/ws")["w"],
            "wc": init_dense(key, C, R, "decoder/readout/wc")["w"],
            "b": jnp.zeros((R,), jnp.float32),
            "b_out": jnp.zeros((cfg.tgt_vocab_size,), jnp.float32),
        },
    }
    if not cfg.tied_readout_embedding:
        p["readout"]["w_out"] = init_dense(
            key, R, cfg.tgt_vocab_size, "decoder/readout/w_out")["w"]
    return p


def _out_matrix(params: Dict[str, Any], cfg: ModelConfig) -> jnp.ndarray:
    if cfg.tied_readout_embedding:
        return params["embed"]["table"].T  # (E, V)
    return params["readout"]["w_out"]


def decode_tables(params: Dict[str, Any]) -> Dict[str, jnp.ndarray]:
    """Per-vocab decode tables (TPU decode fast path).

    In the beam/greedy hot loop, GRU1's input gates and the readout's
    y-term depend ONLY on the previous token id: both are `embed[tok]`
    pushed through a fixed matmul. Precomputing them over the WHOLE vocab
    once per decode dispatch — (V, E) x (E, 3H) and (V, E) x (E, R), a few
    GFLOP amortized over every step of every chunk — turns the per-step
    embed-gather -> matmul chains into single row gathers (measured: the
    embed+GRU1-gates chain alone was ~60 us/step standalone at flagship
    decode shapes, benchmarks/decode_bench.py C1). fp32 tables: these are
    exactly the `preferred_element_type=f32` matmul outputs the per-step
    path produces, so results match the untabled path (parity-tested).

    The tables dict also carries column-wise CONCATENATED weight matrices
    that fuse the remaining per-step GEMMs pairwise (same input rows, so
    one MXU dispatch computes both outputs; per-column results are the
    same dot products as the separate matmuls):
      w_s = [ua | uh2]  (H, A+3H): s_tilde -> attention query + GRU2 h-gates
      w_c = [wx2 | wc]  (C, 3H+R): attention ctx -> GRU2 x-gates + readout
                                   c-term

    Returns {"gy": (V, 3H+R) f32 = [embed @ wi1 + bi1 | embed @ wy] — ONE
             concatenated per-token table, so the per-step lookup is a
             single row gather (two separate gathers measured 32.7 vs 19.7
             us/step fused at V=8000, H=512, R=256 on 1xv5e — gather cost
             is dispatch-dominated, not bytes),
             "w_s": (H, A+3H), "w_c": (C, 3H+R)  [param dtype]}.
    Pass to decode_step_beams/_readout via `tables=`; beam_search /
    greedy_decode / translate thread it through. ~(V * (3H + R) * 4) bytes
    of HBM per decode program (e.g. 49+8 MB at V=8000, H=512, R=256)."""
    emb = params["embed"]["table"]
    return {
        "gy": jnp.concatenate(
            [gru_gates_from_x(params["gru1"], emb),
             jnp.dot(emb, params["readout"]["wy"],
                     preferred_element_type=jnp.float32)], axis=1),
        "w_s": jnp.concatenate(
            [params["attn"]["ua"], params["gru2"]["uh"]], axis=1),
        "w_c": jnp.concatenate(
            [params["gru2"]["wi"], params["readout"]["wc"]], axis=1),
    }


def _readout_t(
    params: Dict[str, Any],
    ty: jnp.ndarray,         # (N, R) f32 precomputed y-term (y_emb @ wy)
    s_new: jnp.ndarray,      # (N, H)
    c: jnp.ndarray,          # (N, C)
    tc: Optional[jnp.ndarray] = None,  # (N, R) f32 precomputed c @ wc
) -> jnp.ndarray:
    """Readout activations t = tanh(ty + s@ws + c@wc + b); dropout on t is
    the CALLER's job (step_from_xgates per step, teacher_forced_logits on
    the stacked activations)."""
    r = params["readout"]
    if tc is None:
        tc = jnp.dot(c, r["wc"], preferred_element_type=jnp.float32)
    return jnp.tanh(
        ty
        + jnp.dot(s_new, r["ws"], preferred_element_type=jnp.float32)
        + tc
        + r["b"]
    )


def step_acts_from_xgates(
    params: Dict[str, Any],
    ty: jnp.ndarray,         # (N, R) f32 precomputed readout y-term (y @ wy)
    xg1: jnp.ndarray,        # (N, 3H) precomputed GRU1 input gates
    s: jnp.ndarray,          # (N, H)
    ctx: jnp.ndarray,        # (N, T, C)
    ctx_proj: jnp.ndarray,   # (N, T, A)
    src_mask: jnp.ndarray,   # (N, T)
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One decoder step up to the readout ACTIVATIONS (pre-dropout, pre
    vocab GEMM). Returns (s_new (N,H), t (N,R) f32, attn (N,T)).

    Both per-step GEMMs that depend only on the input token (GRU1 input
    gates, readout y-term) are precomputed by the caller: time-parallel over
    all positions in teacher forcing, per-vocab tables in the decode loop —
    so the recurrent body is identical across train and decode paths."""
    s_tilde = gru_cell_from_xgates(params["gru1"], xg1, s)
    c, w = bahdanau_attend(params["attn"], s_tilde, ctx, ctx_proj, src_mask)
    s_new = gru_cell_from_xgates(
        params["gru2"], gru_gates_from_x(params["gru2"], c), s_tilde)
    t = _readout_t(params, ty, s_new, c)
    return s_new, t, w


def step_from_xgates(
    params: Dict[str, Any],
    cfg: ModelConfig,
    y_emb: jnp.ndarray,      # (N, E)
    xg1: jnp.ndarray,        # (N, 3H) precomputed GRU1 input gates
    s: jnp.ndarray,          # (N, H)
    ctx: jnp.ndarray,        # (N, T, C)
    ctx_proj: jnp.ndarray,   # (N, T, A)
    src_mask: jnp.ndarray,   # (N, T)
    readout_drop_mask: Optional[jnp.ndarray] = None,  # (N, R) inverted-dropout
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One FULL decoder step (numerics oracle for the fused decode paths).
    Returns (s_new (N,H), logits (N,V) fp32, attn (N,T))."""
    ty = jnp.dot(y_emb, params["readout"]["wy"],
                 preferred_element_type=jnp.float32)
    s_new, t, w = step_acts_from_xgates(
        params, ty, xg1, s, ctx, ctx_proj, src_mask)
    if readout_drop_mask is not None:
        t = t * readout_drop_mask
    logits = (
        jnp.dot(t.astype(ctx.dtype), _out_matrix(params, cfg),
                preferred_element_type=jnp.float32)
        + params["readout"]["b_out"]
    ).astype(jnp.float32)
    return s_new, logits, w


def _beams_step_core(
    params: Dict[str, Any],
    tok: jnp.ndarray,        # (B, K)
    s: jnp.ndarray,          # (B, K, H)
    ctx: jnp.ndarray,
    ctx_proj: jnp.ndarray,
    src_mask: jnp.ndarray,
    tables: Optional[Dict[str, jnp.ndarray]] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
           Optional[jnp.ndarray], jnp.ndarray]:
    """Shared GRU1 -> attention -> GRU2 body of a beam decoder step.

    tables (from `decode_tables`): per-vocab precomputed GRU1 input gates
    and readout y-term — the per-step embed -> matmul chains become row
    gathers — plus concatenated weight matrices w_s/w_c that fuse the four
    remaining per-step GEMMs pairwise (attention query + GRU2 h-gates off
    s_tilde; GRU2 x-gates + readout c-term off the attention context). The
    fused GEMMs compute the SAME per-column dot products as the separate
    matmuls, so results match the untabled path (parity-tested).
    Returns (s_new (B*K, H), ty (B*K, R) f32 readout y-term,
    c_flat (B*K, C), tc (B*K, R) f32 readout c-term or None, attn)."""
    B, K = tok.shape
    H = s.shape[-1]
    flat_tok = tok.reshape(-1)
    if tables is None:
        y = embed(params["embed"], flat_tok).astype(ctx.dtype)
        xg1 = gru_gates_from_x(params["gru1"], y)
        ty = jnp.dot(y, params["readout"]["wy"],
                     preferred_element_type=jnp.float32)
    else:
        gy = jnp.take(tables["gy"], flat_tok, axis=0)
        xg1, ty = gy[:, :3 * H], gy[:, 3 * H:]
    s_tilde = gru_cell_from_xgates(params["gru1"], xg1, s.reshape(B * K, H))
    if tables is not None and "w_s" in tables:
        A = params["attn"]["ua"].shape[1]
        g2 = params["gru2"]
        qh = jnp.dot(s_tilde, tables["w_s"],
                     preferred_element_type=jnp.float32)      # (B*K, A+3H)
        c, w = bahdanau_attend_beams_q(
            params["attn"], qh[:, :A].reshape(B, K, A), ctx, ctx_proj,
            src_mask)
        c_flat = c.reshape(B * K, -1)
        xc = jnp.dot(c_flat, tables["w_c"],
                     preferred_element_type=jnp.float32)      # (B*K, 3H+R)
        s_new = gru_cell_from_gates(
            xc[:, :3 * H] + g2["bi"], qh[:, A:] + g2["bh"], s_tilde)
        tc = xc[:, 3 * H:]
    else:
        c, w = bahdanau_attend_beams(
            params["attn"], s_tilde.reshape(B, K, H), ctx, ctx_proj,
            src_mask)
        c_flat = c.reshape(B * K, -1)
        s_new = gru_cell_from_xgates(
            params["gru2"], gru_gates_from_x(params["gru2"], c_flat),
            s_tilde)
        tc = None
    return s_new, ty, c_flat, tc, w


def decode_step_beams(
    params: Dict[str, Any],
    cfg: ModelConfig,
    tok: jnp.ndarray,        # (B, K) int32 previous tokens, K beams/sentence
    s: jnp.ndarray,          # (B, K, H)
    ctx: jnp.ndarray,        # (B, T, C) — NOT tiled across beams
    ctx_proj: jnp.ndarray,   # (B, T, A)
    src_mask: jnp.ndarray,   # (B, T)
    tables: Optional[Dict[str, jnp.ndarray]] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One decoder step for K beams per sentence sharing the encoder state.

    Per-beam work (embeddings, GRU cells, readout) runs on flattened B*K
    rows; attention broadcasts over the beam axis so ctx/ctx_proj stream
    from HBM once per sentence, not once per beam (see
    ops.attention.bahdanau_attend_beams). Greedy decode is the K=1 case.
    tables: optional per-vocab gate/readout tables (`decode_tables`).
    Returns (s_new (B,K,H), logits (B,K,V) fp32, attn (B,K,T))."""
    B, K = tok.shape
    H = s.shape[-1]
    s_new, ty, c_flat, tc, w = _beams_step_core(params, tok, s, ctx,
                                                ctx_proj, src_mask, tables)
    r = params["readout"]
    t = _readout_t(params, ty, s_new, c_flat, tc=tc)
    logits = (
        jnp.dot(t.astype(c_flat.dtype), _out_matrix(params, cfg),
                preferred_element_type=jnp.float32)
        + r["b_out"]
    ).astype(jnp.float32)
    return (s_new.reshape(B, K, H), logits.reshape(B, K, -1), w)


def decode_step_beams_readout(
    params: Dict[str, Any],
    cfg: ModelConfig,
    tok: jnp.ndarray,        # (B, K)
    s: jnp.ndarray,          # (B, K, H)
    ctx: jnp.ndarray,
    ctx_proj: jnp.ndarray,
    src_mask: jnp.ndarray,
    tables: Optional[Dict[str, jnp.ndarray]] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Beam decoder step stopping at the readout ACTIVATIONS: returns
    (s_new (B,K,H), t (B*K, R) in compute dtype, w_out (R, V), b_out (V,))
    so the vocab projection can run fused with top-k
    (ops/pallas_readout_topk) without materializing (B*K, V) logits.
    tables: optional per-vocab gate/readout tables (`decode_tables`).

    With tables active and VAG_DEC_STEP=on, the whole mid-section
    (GRU1 -> attention -> GRU2 -> readout activations) runs as ONE fused
    Pallas kernel (ops/pallas_dec_step) with every attention intermediate
    VMEM-resident instead of materializing the (B, K, T, A) broadcast.
    Default OFF: a measured NEGATIVE (XLA's batched-MXU attention einsums
    beat Mosaic's VPU reductions — see use_dec_step_kernel's table); kept
    as an A/B artifact. Same fused-GEMM dot products, not bit-identical
    (reassociation); the env is part of decode/translate's program-cache
    fingerprint."""
    B, K = tok.shape
    H = s.shape[-1]
    r = params["readout"]
    if tables is not None and "w_s" in tables:
        from vag_nmt_tpu.ops.pallas_dec_step import (
            dec_step_shapes_supported, pallas_decode_step,
            use_dec_step_kernel)

        G = tables["gy"].shape[-1]
        if use_dec_step_kernel() and dec_step_shapes_supported(
                H, params["attn"]["ua"].shape[1], ctx.shape[-1], G - 3 * H):
            s_new3, t = pallas_decode_step(params, tables, tok, s, ctx,
                                           ctx_proj, src_mask)
            return (s_new3, t.astype(ctx.dtype),
                    _out_matrix(params, cfg),
                    r["b_out"].astype(jnp.float32))
    s_new, ty, c_flat, tc, _ = _beams_step_core(params, tok, s, ctx,
                                                ctx_proj, src_mask, tables)
    t = _readout_t(params, ty, s_new, c_flat, tc=tc)
    return (s_new.reshape(B, K, H), t.astype(c_flat.dtype),
            _out_matrix(params, cfg), r["b_out"].astype(jnp.float32))


def teacher_forced_logits(
    params: Dict[str, Any],
    cfg: ModelConfig,
    tgt_in: jnp.ndarray,     # (B, Tt) int32, starts with <sos>
    s0: jnp.ndarray,         # (B, H)
    ctx: jnp.ndarray,        # (B, T, C)
    src_mask: jnp.ndarray,   # (B, T)
    *,
    train: bool = False,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Logits for every target position: (B, Tt, V) fp32, one fused scan.

    TPU structure: every GEMM that does not depend on the recurrent state
    runs time-parallel OUTSIDE the scan — the GRU1 input gates and the
    readout y-term before it (both functions of the known teacher-forced
    tokens), and, the big one, the (R, V) vocab projection after it. The
    scan emits only the (B, Tt, R) readout activations; the vocab logits
    are then ONE (B*Tt, R) x (R, V) MXU-shaped matmul instead of Tt
    narrow (B, R) x (R, V) matmuls serialized inside the scan (and its
    backward likewise becomes one big GEMM pair instead of Tt small ones).
    Same dot products per element, so numerics match the per-step oracle
    (`step_from_xgates`); goldens unchanged. The readout dropout mask
    applies to the stacked activations, identical to masking per step."""
    B, Tt = tgt_in.shape
    R = params["readout"]["wy"].shape[1]
    y = embed(params["embed"], tgt_in).astype(ctx.dtype)       # (B, Tt, E)
    if train and rng is not None:
        y = dropout(key_for(rng, "decoder/emb_drop"), y, cfg.dropout, train)
    xg1 = gru_gates_from_x(params["gru1"], y)                   # (B, Tt, 3H)
    ty = jnp.dot(y, params["readout"]["wy"],
                 preferred_element_type=jnp.float32)            # (B, Tt, R)
    ctx_proj = precompute_ctx_proj(params["attn"], ctx)

    impl = cfg.dec_scan_impl
    if impl == "auto":
        # Chip-measured policy (benchmarks/dec_scan_bench.py +
        # train_bench.py interleaved A/Bs, v5e): the fused kernel wins
        # fwd+bwd at every TIME-BLOCKED shape/dtype — kernel-level
        # 1.03-1.35x, full-train-step 1.27x at the Tt=16 bucket shape —
        # but the win comes from amortizing the ~3.5 us grid-step cost
        # over KT unrolled steps, so it needs a real time block: at
        # Tt=17 (KT degenerates to 1) the full train step measured
        # 0.66x (3.13 vs 2.08 ms/step, interleaved). Production bucket
        # widths are all multiples of 4 (core/config.length_buckets), so
        # the KT>=4 gate never fires there; it protects ad-hoc shapes.
        # Forward-only (eval loss) wins under bf16 streams (1.0-1.4x)
        # but loses fp32 at long T (0.62x at IKEA T=Tt=128, where the
        # fp32 ctx tile halves the batch-tile size), so no-grad fp32
        # keeps the XLA scan.
        from vag_nmt_tpu.ops.pallas_gru import _pick_kt

        use = (jax.default_backend() == "tpu"
               and _pick_kt(Tt) >= 4
               and (train or cfg.compute_dtype == "bfloat16"))
        impl = "pallas" if use else "xla"
    if impl == "pallas":
        # Fused Pallas kernel: weights + the batch tile's ctx/ctx_proj stay
        # VMEM-resident across all Tt steps instead of re-streaming from HBM
        # per step (ops/pallas_dec_scan.py; custom VJP, so training too).
        from vag_nmt_tpu.ops.pallas_dec_scan import pallas_decoder_scan

        t_all = pallas_decoder_scan(params, ty, xg1, s0, ctx, ctx_proj,
                                    src_mask)
    elif impl == "xla":
        def step(s, inp):
            ty_t, xg_t = inp
            s_new, t, _ = step_acts_from_xgates(
                params, ty_t, xg_t, s, ctx, ctx_proj, src_mask)
            return s_new, t

        xs = (jnp.swapaxes(ty, 0, 1), jnp.swapaxes(xg1, 0, 1))
        _, t_all = jax.lax.scan(step, s0, xs)                   # (Tt, B, R)
        t_all = jnp.swapaxes(t_all, 0, 1)                       # (B, Tt, R)
    else:
        raise ValueError(f"unknown dec_scan_impl {impl!r}")

    if train and rng is not None and cfg.dropout > 0:
        keep = 1.0 - cfg.dropout
        dm = jax.random.bernoulli(
            key_for(rng, "decoder/readout_drop"), keep, (B, Tt, R)
        ).astype(jnp.float32) / keep
        t_all = t_all * dm

    logits = (
        jnp.dot(t_all.astype(ctx.dtype), _out_matrix(params, cfg),
                preferred_element_type=jnp.float32)
        + params["readout"]["b_out"]
    )
    return logits.astype(jnp.float32)
