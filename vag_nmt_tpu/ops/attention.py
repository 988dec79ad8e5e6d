"""Masked Bahdanau (MLP) attention over encoder states.

The reference's decoder attends dl4mt-style each step (SURVEY.md C8,
[LOW-CONF on exact variant] — mount empty this session). TPU-first detail:
the context-side projection ``ctx @ wa`` is hoisted out of the decode loop and
computed ONCE per sentence (`precompute_ctx_proj`), so each decode step does
only a (N, H)x(H, A) query projection + VPU tanh + (N, T) reduction."""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from vag_nmt_tpu.core.rng import key_for

Params = Dict[str, jnp.ndarray]

NEG_INF = -1e9


def init_attention_params(key: jax.Array, ctx_dim: int, query_dim: int,
                          attn_dim: int, path: str = "attn",
                          dtype=jnp.float32) -> Params:
    g = jax.nn.initializers.glorot_uniform()
    return {
        "wa": g(key_for(key, path + "/wa"), (ctx_dim, attn_dim), dtype),
        "ua": g(key_for(key, path + "/ua"), (query_dim, attn_dim), dtype),
        "ba": jnp.zeros((attn_dim,), dtype),
        "va": g(key_for(key, path + "/va"), (attn_dim, 1), dtype)[:, 0],
    }


def precompute_ctx_proj(params: Params, ctx: jnp.ndarray) -> jnp.ndarray:
    """(N, T, C) -> (N, T, A); hoisted out of the decode loop."""
    return jnp.dot(ctx, params["wa"], preferred_element_type=jnp.float32)


def masked_softmax(scores: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Softmax over the last axis with 0/1 mask (pads get exactly 0 weight)."""
    scores = jnp.where(mask > 0, scores, NEG_INF)
    return jax.nn.softmax(scores, axis=-1)


def bahdanau_attend(
    params: Params,
    query: jnp.ndarray,      # (N, Q)
    ctx: jnp.ndarray,        # (N, T, C)
    ctx_proj: jnp.ndarray,   # (N, T, A) from precompute_ctx_proj
    mask: jnp.ndarray,       # (N, T)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (context vector (N, C), weights (N, T))."""
    q = jnp.dot(query, params["ua"], preferred_element_type=jnp.float32)
    e = jnp.tanh(ctx_proj + q[:, None, :] + params["ba"])
    scores = jnp.einsum("nta,a->nt", e, params["va"])
    w = masked_softmax(scores, mask)
    c = jnp.einsum("nt,ntc->nc", w.astype(ctx.dtype), ctx)
    return c, w


def bahdanau_attend_beams(
    params: Params,
    query: jnp.ndarray,      # (B, K, Q) — K beams per sentence
    ctx: jnp.ndarray,        # (B, T, C) — NOT tiled across beams
    ctx_proj: jnp.ndarray,   # (B, T, A)
    mask: jnp.ndarray,       # (B, T)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Beam-batched attention sharing the encoder state across beams.

    The tiled formulation (`jnp.repeat` ctx/ctx_proj to B*K rows, then
    `bahdanau_attend`) re-reads the encoder context from HBM once PER BEAM
    per decode step. Broadcasting over a separate beam axis instead reads
    ctx/ctx_proj once per SENTENCE (K-fold less HBM traffic in the decode
    hot loop) and turns the weighted sum into a batched (K,T)x(T,C) matmul
    that tiles onto the MXU. Returns ((B, K, C), (B, K, T))."""
    q = jnp.dot(query, params["ua"], preferred_element_type=jnp.float32)
    return bahdanau_attend_beams_q(params, q, ctx, ctx_proj, mask)


def bahdanau_attend_beams_q(
    params: Params,
    q: jnp.ndarray,          # (B, K, A) PRE-projected query (query @ ua), f32
    ctx: jnp.ndarray,        # (B, T, C)
    ctx_proj: jnp.ndarray,   # (B, T, A)
    mask: jnp.ndarray,       # (B, T)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """`bahdanau_attend_beams` with the query projection already applied —
    the decode fast path fuses `query @ ua` column-wise into the GRU2
    hidden-gate matmul (same input rows), so attention receives q directly.

    The (B, K, T, A) energy broadcast is the decode step's single largest
    term (~51 of ~97 us mid-section at T=32, r5 stage attribution,
    benchmarks/dec_stage_bench.py). Under bf16 compute the broadcast is
    evaluated in bf16 (the declared compute-dtype regime; score
    accumulation over A stays f32 via the einsum's preferred type), which
    halves its HBM footprint; VAG_ATTN_E_DTYPE=fp32 forces the f32
    broadcast for A/B runs and as the numerics oracle, and =bf16 forces
    the bf16 broadcast inside an otherwise-fp32 decode (r5 interleaved
    e2e: +0.6%, noise-level — the fp32-decode default already absorbed
    the conversion win, so pure fp32 stays the default there); part of
    translate's program-cache env fingerprint."""
    import os

    env = os.environ.get("VAG_ATTN_E_DTYPE", "")
    if ((ctx.dtype == jnp.bfloat16 and env != "fp32")
            or env in ("bf16", "bfloat16")):
        e = jnp.tanh(ctx_proj.astype(jnp.bfloat16)[:, None, :, :]
                     + q.astype(jnp.bfloat16)[:, :, None, :]
                     + params["ba"].astype(jnp.bfloat16))
        scores = jnp.einsum("bkta,a->bkt", e,
                            params["va"].astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
    else:
        e = jnp.tanh(ctx_proj[:, None, :, :] + q[:, :, None, :]
                     + params["ba"])
        scores = jnp.einsum("bkta,a->bkt", e, params["va"])
    w = masked_softmax(scores, mask[:, None, :])
    c = jnp.einsum("bkt,btc->bkc", w.astype(ctx.dtype), ctx)
    return c, w
