"""Greedy decoding as a single on-device `lax.scan` (SURVEY.md C12).

Fixed shapes, no host syncs; finished rows emit <pad> so the output buffer is
directly de-tokenizable."""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from vag_nmt_tpu.core.config import EOS_ID, ModelConfig, PAD_ID, SOS_ID
from vag_nmt_tpu.models.model import DecodeState, decode_step


def greedy_decode(
    params: Dict[str, Any],
    cfg: ModelConfig,
    state: DecodeState,
    max_len: int,
    tables=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (tokens (B, max_len) int32 padded with PAD, lengths (B,) incl EOS).
    tables: optional per-vocab gate/readout tables (decoder.decode_tables)."""
    B = state.s0.shape[0]

    def step(carry, _):
        tok, s, finished, length = carry
        # K=1 beam axis; encoder state stays per-sentence
        s_new, logits = decode_step(params, cfg, tok[:, None], s, state,
                                    tables)
        nxt = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)
        nxt = jnp.where(finished, PAD_ID, nxt)
        now_finished = finished | (nxt == EOS_ID)
        length = jnp.where(finished, length, length + 1)
        return (nxt, s_new, now_finished, length), nxt

    init = (
        jnp.full((B,), SOS_ID, jnp.int32),
        state.s0[:, None, :],
        jnp.zeros((B,), bool),
        jnp.zeros((B,), jnp.int32),
    )
    (_, _, _, lengths), toks = jax.lax.scan(step, init, None, length=max_len)
    return jnp.swapaxes(toks, 0, 1), lengths
