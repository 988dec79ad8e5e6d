"""Device mesh + sharding rules — the TPU-native "communication backend".

The reference is single-process/single-GPU with no distributed code at all
(SURVEY.md §2 'Parallelism strategies'); scaling here is a 2-D
``jax.sharding.Mesh`` ('data', 'model') with sharding annotations. XLA GSPMD
inserts the gradient all-reduce (psum over 'data') and the vocab-parallel
collectives (over 'model') — there is no explicit NCCL-style backend to write.

- DP: batches sharded over 'data' (primary axis; the model is ~10-30M params).
- TP: source/target embedding tables and the output projection sharded over
  'model' on the vocab dimension (used by the scaled preset).
- PP / EP / SP-CP: N/A for this model family — no pipeline stages, no MoE, and
  captions are <=~128 BPE tokens (documented as considered-and-rejected in
  SURVEY.md §2/§5).
"""

from __future__ import annotations

import re
from typing import Any, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: int = -1, n_model: int = 1, devices=None
) -> Mesh:
    """Build a ('data','model') mesh. n_data == -1 uses all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data == -1:
        if len(devices) % n_model != 0:
            raise ValueError(
                f"{len(devices)} devices not divisible by model axis {n_model}"
            )
        n_data = len(devices) // n_model
    need = n_data * n_model
    if need > len(devices):
        raise ValueError(
            f"mesh ({n_data} data x {n_model} model = {need} devices) "
            f"exceeds the {len(devices)} available devices")
    grid = np.array(devices[:need]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim sharded over 'data'; applied to every batch leaf."""
    return NamedSharding(mesh, P(DATA_AXIS))


def stacked_batch_sharding(mesh: Mesh) -> NamedSharding:
    """For K-step stacked batches (leading dim = K scan steps): the SECOND
    dim is the batch, sharded over 'data'; the step dim stays unsharded."""
    return NamedSharding(mesh, P(None, DATA_AXIS))


# Param-path regex -> PartitionSpec factory. Paths are '/'-joined dict keys,
# e.g. 'encoder/embed/table', 'decoder/readout/w_out'. Vocab-dim sharding over
# 'model' covers the big tables; everything else is replicated (tiny).
_TP_RULES: Tuple[Tuple[str, Any], ...] = (
    (r".*/embed/table$", lambda: P(MODEL_AXIS, None)),   # (V, E) sharded on V
    (r".*/readout/w_out$", lambda: P(None, MODEL_AXIS)),  # (R, V) sharded on V
    (r".*/readout/b_out$", lambda: P(MODEL_AXIS)),        # (V,)
)


def _spec_for(path: str, use_tp: bool) -> P:
    if use_tp:
        for pat, spec in _TP_RULES:
            if re.match(pat, path):
                return spec()
    return P()


def param_shardings(mesh: Mesh, tree: Any) -> Any:
    """NamedSharding pytree matching `tree` (params, or any state pytree whose
    param-shaped leaves keep their param path suffix, e.g. Adam moments).
    TP rules activate only when the mesh actually has a >1 'model' axis."""
    use_tp = mesh.shape[MODEL_AXIS] > 1

    def path_str(kp) -> str:
        parts = []
        for k in kp:
            if hasattr(k, "key"):
                parts.append(str(k.key))
            elif hasattr(k, "idx"):
                parts.append(str(k.idx))
            elif hasattr(k, "name"):
                parts.append(str(k.name))
            else:
                parts.append(str(k))
        return "/".join(parts)

    leaves, treedef = jax.tree_util.tree_flatten_with_path(tree)
    shardings = [
        NamedSharding(mesh, _spec_for(path_str(kp), use_tp)) for kp, _ in leaves
    ]
    return jax.tree_util.tree_unflatten(treedef, shardings)


def host_shard(items, process_index: Optional[int] = None,
               process_count: Optional[int] = None):
    """Per-host slice of a corpus for multi-host (DCN) training: host i takes
    items[i::n_hosts] (SURVEY.md §2 'Multi-host'). With the same pjit program
    running on every host, each host feeds its shard of the global batch and
    GSPMD's gradient all-reduce spans hosts transparently. Single-host runs
    return `items` unchanged."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    if pc <= 1:
        return list(items)
    return list(items)[pi::pc]
