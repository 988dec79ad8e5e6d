"""Shared parameter-init and small layer helpers (pure functions over dicts)."""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from vag_nmt_tpu.core.rng import key_for

Params = Dict[str, jnp.ndarray]


def init_embedding(key: jax.Array, vocab: int, dim: int, path: str,
                   dtype=jnp.float32) -> Params:
    scale = dim ** -0.5
    table = scale * jax.random.normal(key_for(key, path + "/table"),
                                      (vocab, dim), dtype)
    return {"table": table}


def embed(params: Params, ids: jnp.ndarray) -> jnp.ndarray:
    return jnp.take(params["table"], ids, axis=0)


def init_dense(key: jax.Array, in_dim: int, out_dim: int, path: str,
               dtype=jnp.float32) -> Params:
    w = jax.nn.initializers.glorot_uniform()(key_for(key, path + "/w"),
                                             (in_dim, out_dim), dtype)
    return {"w": w, "b": jnp.zeros((out_dim,), dtype)}


def dense(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    return jnp.dot(x, params["w"], preferred_element_type=jnp.float32) + params["b"]


def dropout(rng: Optional[jax.Array], x: jnp.ndarray, rate: float,
            train: bool) -> jnp.ndarray:
    if not train or rate <= 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def l2_normalize(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    # eps INSIDE the sqrt: d/dx of ||x|| alone is NaN at x == 0, and all-pad
    # batch-filler rows (zero image features) hit exactly that point.
    return x * jax.lax.rsqrt(jnp.sum(jnp.square(x), -1, keepdims=True) + eps)


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean of (B, T, C) over real tokens per (B, T) mask -> (B, C)."""
    num = jnp.einsum("btc,bt->bc", x, mask.astype(x.dtype))
    den = jnp.maximum(mask.sum(-1, keepdims=True), 1.0).astype(x.dtype)
    return num / den
