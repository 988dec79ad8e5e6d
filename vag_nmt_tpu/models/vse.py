"""Shared visual-text embedding space + max-margin grounding loss
(SURVEY.md C5-C7).

- image side: pool5 feature (2048-d) -> tanh dense -> L2 norm into shared space;
- text side: the image embedding QUERIES a Bahdanau attention over encoder
  states (visual attention grounding, the paper's core idea); the weighted sum
  is projected + L2-normalized into the same space;
- loss: bidirectional in-batch max-margin ranking on cosine similarity
  (sum-of-violations by default; VSE++-style hardest-negative behind a flag).
  [LOW-CONF margin/weight/reduction — reference mount empty this session.]
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from vag_nmt_tpu.core.config import ModelConfig
from vag_nmt_tpu.models.layers import init_dense, dense, l2_normalize
from vag_nmt_tpu.ops.attention import (
    bahdanau_attend,
    init_attention_params,
    precompute_ctx_proj,
)


def init_vse(key: jax.Array, cfg: ModelConfig) -> Dict[str, Any]:
    return {
        "img_proj": init_dense(key, cfg.img_feat_dim, cfg.shared_dim, "vse/img_proj"),
        "ground": init_attention_params(key, cfg.ctx_dim, cfg.shared_dim,
                                        cfg.attn_dim, "vse/ground"),
        "txt_proj": init_dense(key, cfg.ctx_dim, cfg.shared_dim, "vse/txt_proj"),
    }


def image_embedding(params: Dict[str, Any], img_feat: jnp.ndarray) -> jnp.ndarray:
    """(B, F) pool5 features -> (B, D) unit-norm shared-space embedding."""
    return l2_normalize(jnp.tanh(dense(params["img_proj"], img_feat)))


def ground(
    params: Dict[str, Any],
    img_emb: jnp.ndarray,    # (B, D)
    ctx: jnp.ndarray,        # (B, T, C)
    src_mask: jnp.ndarray,   # (B, T)
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Visual attention grounding. Returns (txt_emb (B,D), t_vec (B,C), beta (B,T))."""
    ctx_proj = precompute_ctx_proj(params["ground"], ctx)
    t_vec, beta = bahdanau_attend(params["ground"], img_emb.astype(ctx.dtype),
                                  ctx, ctx_proj, src_mask)
    txt_emb = l2_normalize(jnp.tanh(dense(params["txt_proj"], t_vec)))
    return txt_emb, t_vec, beta


def max_margin_loss(
    img_emb: jnp.ndarray,    # (B, D) unit-norm
    txt_emb: jnp.ndarray,    # (B, D) unit-norm
    margin: float,
    hard_negatives: bool = False,
    sample_mask: jnp.ndarray = None,  # (B,) 1.0 for real rows, 0.0 for batch pad
) -> jnp.ndarray:
    """Bidirectional in-batch pairwise ranking loss on cosine similarity.

    Rows with sample_mask == 0 (fixed-shape batch padding) are excluded from
    both sides of the ranking — they are neither anchors nor negatives."""
    sim = jnp.dot(txt_emb, img_emb.T, preferred_element_type=jnp.float32)
    pos = jnp.diag(sim)
    b = sim.shape[0]
    valid_pair = 1.0 - jnp.eye(b, dtype=sim.dtype)
    n_valid = jnp.asarray(b, sim.dtype)
    if sample_mask is not None:
        sm = sample_mask.astype(sim.dtype)
        valid_pair = valid_pair * sm[:, None] * sm[None, :]
        n_valid = jnp.maximum(sm.sum(), 1.0)
    # sentence -> wrong images, and image -> wrong sentences
    cost_s = jax.nn.relu(margin + sim - pos[:, None]) * valid_pair
    cost_i = jax.nn.relu(margin + sim - pos[None, :]) * valid_pair
    if hard_negatives:
        return (cost_s.max(axis=1) + cost_i.max(axis=0)).sum() / n_valid
    return (cost_s.sum(axis=1) + cost_i.sum(axis=0)).sum() / n_valid
