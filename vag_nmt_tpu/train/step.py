"""The pjit train step (SURVEY.md C11, §5 'Distributed comm backend').

One jitted program: forward (encoder scans + grounding + teacher-forced
decoder + joint CE+VSE loss), backward, clip, Adam, apply. Under a >1-device
mesh the batch is sharded over 'data' and XLA GSPMD inserts the gradient
all-reduce over ICI; with a >1 'model' axis the vocab-dim TP sharding of the
embedding/readout tables partitions the softmax matmuls. Train-state buffers
are donated, so params/moments update in place in HBM."""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from vag_nmt_tpu.core.config import Config, EOS_ID, PAD_ID, SOS_ID
from vag_nmt_tpu.models import loss_fn
from vag_nmt_tpu.parallel.sharding import (
    batch_sharding,
    param_shardings,
    replicated,
)
from vag_nmt_tpu.train.state import TrainState, make_optimizer
from vag_nmt_tpu.utils.pytree import global_norm


def _batch_shardings(mesh, batch_spec: Dict[str, Any]):
    sh = batch_sharding(mesh)
    return {k: sh for k in batch_spec}


def expand_compact_batch(batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Rebuild the classic batch keys ON DEVICE from a compact batch
    (BucketBatcher(compact=True): uint16 tokens + int32 lengths). The host
    then feeds ~4x fewer bytes per step and builds no masks; equivalence
    with the classic keys is bit-tested in tests/test_data.py."""
    src = batch["src"].astype(jnp.int32)
    tgt = batch["tgt"].astype(jnp.int32)
    B, Tt = tgt.shape
    spos = jnp.arange(src.shape[1], dtype=jnp.int32)[None, :]
    tpos = jnp.arange(Tt, dtype=jnp.int32)[None, :]
    sl = batch["src_len"][:, None]
    tl = batch["tgt_len"][:, None]
    sample = batch["sample_mask"]
    # tgt is zero-padded past tgt_len, so the shift-right inherits PAD tails;
    # filler rows (sample_mask 0) get a masked-out SOS/EOS, matching the
    # classic path's all-PAD rows in every loss term (tgt_mask is 0 there).
    out = {
        "src": src,
        "src_mask": (spos < sl).astype(jnp.float32),
        "tgt_in": jnp.concatenate(
            [jnp.full((B, 1), SOS_ID, jnp.int32), tgt[:, :-1]], axis=1),
        "tgt_out": jnp.where(tpos == tl, EOS_ID, tgt),
        # tgt_len == -1 marks a row with NO target (matches the classic
        # path's all-zero tgt_mask there; tl=0 is a real empty target whose
        # EOS position stays live).
        "tgt_mask": (((tpos <= tl) & (tl >= 0)).astype(jnp.float32)
                     * sample[:, None]),
        "sample_mask": sample,
    }
    if "img_ids" in batch:
        out["img_ids"] = batch["img_ids"]
    if "img" in batch:
        out["img"] = batch["img"]
    return out


def _make_step_body(cfg: Config, tx, with_img_table: bool):
    """The single-step update, shared by the one-step and multi-step
    dispatchers: expand compact batch, gather features, joint loss, grad,
    clip+Adam (via tx), apply."""

    def _step_body(state, batch, base_rng, img_table):
        rng = jax.random.fold_in(base_rng, state.step)
        if "src_len" in batch:
            batch = expand_compact_batch(batch)
        if with_img_table:
            batch = dict(batch)
            batch["img"] = jnp.take(img_table, batch.pop("img_ids"), axis=0)

        def lf(params):
            return loss_fn(params, cfg.model, batch, rng, train=True)

        (_, aux), grads = jax.value_and_grad(lf, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        updates = jax.tree.map(lambda u: -state.lr * u, updates)
        new_params = optax.apply_updates(state.params, updates)
        aux = dict(aux)
        aux["grad_norm"] = global_norm(grads)
        aux["lr"] = state.lr
        new_state = TrainState(step=state.step + 1, params=new_params,
                               opt_state=new_opt, lr=state.lr)
        return new_state, aux

    return _step_body


def make_train_step(
    cfg: Config,
    mesh=None,
    example_state: Optional[TrainState] = None,
    example_batch: Optional[Dict[str, Any]] = None,
    *,
    with_img_table: bool = False,
):
    """Returns (jitted_step, state_shardings). state_shardings is None for the
    single-device path and a TrainState-of-NamedSharding under a mesh (use it
    to place the state before the first call).

    with_img_table=True: the step takes a 4th arg, a device-resident (N, F)
    feature table, and batches carry int32 "img_ids" rows instead of "img" —
    the gather happens on device. Feeding the ~0.5 MB of pool5 features per
    batch from the host dominated wall-clock step time (device compute is
    <1 ms); with the table the per-step feed is a few KB."""
    tx = make_optimizer(cfg)
    _step_body = _make_step_body(cfg, tx, with_img_table)

    def step(state: TrainState, batch: Dict[str, jnp.ndarray],
             base_rng: jax.Array, img_table: Optional[jax.Array] = None):
        # Trace-time context: under a mesh the Pallas GRU kernel (gru_impl
        # "auto" on TPU / explicit "pallas") is shard_map'ed over 'data' —
        # GSPMD can't partition a custom call, but the scan is batch-parallel
        # so each shard runs the same grid and only the weight grads psum.
        from vag_nmt_tpu.ops.pallas_gru import shard_mesh

        with shard_mesh(mesh):
            return _step_body(state, batch, base_rng, img_table)

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,)), None

    assert example_state is not None and example_batch is not None
    state_sh = TrainState(
        step=replicated(mesh),
        params=param_shardings(mesh, example_state.params),
        opt_state=param_shardings(mesh, example_state.opt_state),
        lr=replicated(mesh),
    )
    aux_sh = None  # let GSPMD infer the (scalar) metric shardings
    in_sh = [state_sh, _batch_shardings(mesh, example_batch),
             replicated(mesh)]
    if with_img_table:
        in_sh.append(replicated(mesh))
    return jax.jit(
        step,
        in_shardings=tuple(in_sh),
        out_shardings=(state_sh, aux_sh),
        donate_argnums=(0,),
    ), state_sh


def make_multi_step(
    cfg: Config,
    mesh=None,
    example_state: Optional[TrainState] = None,
    example_stack: Optional[Dict[str, Any]] = None,
    *,
    with_img_table: bool = False,
):
    """K-step dispatcher: ONE jitted call runs a `lax.scan` of K train steps
    over a stacked batch pytree (every leaf carries a leading K axis).

    Why: per-step dispatch pays a fixed per-execution overhead that can
    dwarf device compute — measured 13.8 ms/step completion-rate on the
    tunneled v5e against 0.74 ms of device compute (and ~tens of µs of real
    dispatch cost on local hardware). Scanning K steps inside the graph
    amortizes that overhead K-fold and lets XLA overlap the steps' transfers
    and compute. Numerics are EXACTLY the sequential single steps: the body
    is the same `_make_step_body` and the per-step RNG folds state.step.

    Returns (jitted_fn(state, stacked_batches, base_rng[, img_table]) ->
    (state, aux_stack), state_shardings) with aux_stack leaves shaped (K,).
    """
    tx = make_optimizer(cfg)
    _step_body = _make_step_body(cfg, tx, with_img_table)

    def multi(state: TrainState, batches: Dict[str, jnp.ndarray],
              base_rng: jax.Array, img_table: Optional[jax.Array] = None):
        from vag_nmt_tpu.ops.pallas_gru import shard_mesh

        with shard_mesh(mesh):
            def body(st, batch):
                return _step_body(st, batch, base_rng, img_table)

            return jax.lax.scan(body, state, batches)

    if mesh is None:
        return jax.jit(multi, donate_argnums=(0,)), None

    assert example_state is not None and example_stack is not None
    state_sh = TrainState(
        step=replicated(mesh),
        params=param_shardings(mesh, example_state.params),
        opt_state=param_shardings(mesh, example_state.opt_state),
        lr=replicated(mesh),
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vag_nmt_tpu.parallel.sharding import DATA_AXIS

    stack_sh = {k: NamedSharding(mesh, P(None, DATA_AXIS))
                for k in example_stack}
    in_sh = [state_sh, stack_sh, replicated(mesh)]
    if with_img_table:
        in_sh.append(replicated(mesh))
    return jax.jit(
        multi,
        in_shardings=tuple(in_sh),
        out_shardings=(state_sh, None),
        donate_argnums=(0,),
    ), state_sh


def make_packed_step(cfg: Config, *, with_img_table: bool = False,
                     multi: bool = False):
    """Single-device fast path: the batch (single or K-stacked) arrives as
    ONE flat uint8 buffer and is unpacked inside the jit (data/packing.py).
    On links with high per-transfer latency this collapses the per-step feed
    from one transfer PER LEAF to one transfer per dispatch (measured ~10 ms
    per transfer on a tunneled v5e against 1.9 ms device compute/step).
    The unpack spec is a static argument, so each batch layout compiles its
    own program — same specialization granularity as shaped batches.

    Mesh note: a packed buffer cannot carry per-leaf batch shardings, so the
    mesh paths keep the per-leaf feed (make_train_step / make_multi_step).
    """
    import functools

    from vag_nmt_tpu.data.packing import unpack_batch

    tx = make_optimizer(cfg)
    _step_body = _make_step_body(cfg, tx, with_img_table)

    @functools.partial(jax.jit, static_argnames=("spec",),
                       donate_argnums=(0,))
    def fn(state: TrainState, buf: jnp.ndarray, base_rng: jax.Array,
           img_table: Optional[jax.Array] = None, *, spec):
        batch = unpack_batch(buf, spec)
        if multi:
            def body(st, b):
                return _step_body(st, b, base_rng, img_table)

            return jax.lax.scan(body, state, batch)
        return _step_body(state, batch, base_rng, img_table)

    return fn


def make_eval_step(cfg: Config) -> Callable:
    def step(params, batch):
        _, aux = loss_fn(params, cfg.model, batch, None, train=False)
        return aux

    return jax.jit(step)
