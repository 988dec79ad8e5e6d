"""Bidirectional GRU text encoder (SURVEY.md C4).

The reference wraps ``nn.GRU(bidirectional=True)`` reaching cuDNN's fused
kernel; here each direction is a masked fused scan from ``ops/gru.py`` (XLA or
Pallas impl per config). Layers stack on the concatenated (B, T, 2H) outputs
with inter-layer dropout."""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from vag_nmt_tpu.core.config import ModelConfig
from vag_nmt_tpu.core.rng import key_for
from vag_nmt_tpu.models.layers import dropout, embed, init_embedding
from vag_nmt_tpu.ops.gru import bidirectional_gru, init_gru_params


def init_encoder(key: jax.Array, cfg: ModelConfig) -> Dict[str, Any]:
    layers = []
    for i in range(cfg.enc_layers):
        in_dim = cfg.emb_dim if i == 0 else cfg.ctx_dim
        layers.append({
            "fwd": init_gru_params(key, in_dim, cfg.hidden_dim,
                                   f"encoder/l{i}/fwd"),
            "bwd": init_gru_params(key, in_dim, cfg.hidden_dim,
                                   f"encoder/l{i}/bwd"),
        })
    return {
        "embed": init_embedding(key, cfg.src_vocab_size, cfg.emb_dim,
                                "encoder/embed"),
        "layers": layers,
    }


def encode(
    params: Dict[str, Any],
    cfg: ModelConfig,
    src: jnp.ndarray,        # (B, T) int32
    src_mask: jnp.ndarray,   # (B, T) float
    *,
    train: bool = False,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Returns encoder states ctx (B, T, 2H)."""
    x = embed(params["embed"], src).astype(_dtype(cfg))
    if train and rng is not None:
        x = dropout(key_for(rng, "encoder/emb_drop"), x, cfg.dropout, train)
    for i, layer in enumerate(params["layers"]):
        x, _, _ = bidirectional_gru(layer["fwd"], layer["bwd"], x, src_mask,
                                    impl=cfg.gru_impl)
        if train and rng is not None and i + 1 < len(params["layers"]):
            x = dropout(key_for(rng, f"encoder/l{i}_drop"), x, cfg.dropout, train)
    return x


def _dtype(cfg: ModelConfig):
    return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
