"""Train state: params + Adam moments + step + host-controlled LR.

The reference trains with Adam, grad clipping, and LR decay triggered by dev
BLEU plateau (SURVEY.md C11). Plateau decay is a host-side decision between
evals, so the LR lives IN the state as an array and the jitted step just
reads it — no recompile on decay."""

from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import optax

from vag_nmt_tpu.core.config import Config
from vag_nmt_tpu.models import init_params


class TrainState(NamedTuple):
    step: jnp.ndarray        # () int32
    params: Dict[str, Any]
    opt_state: Any
    lr: jnp.ndarray          # () float32, decayed on plateau by the host loop


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(cfg.train.grad_clip_norm),
        optax.scale_by_adam(b1=cfg.train.adam_b1, b2=cfg.train.adam_b2,
                            eps=cfg.train.adam_eps),
    )


def create_train_state(key: jax.Array, cfg: Config) -> TrainState:
    params = init_params(key, cfg.model)
    tx = make_optimizer(cfg)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        lr=jnp.asarray(cfg.train.learning_rate, jnp.float32),
    )
