"""Worker process for the two-process jax.distributed smoke test (SURVEY.md
§2 'Multi-host'; VERDICT r2 item 6). NOT a pytest file — spawned by
tests/test_distributed.py as `python tests/dist_worker.py <pid> <nproc>
<port> <out.npz>`.

Each process: gloo-backed CPU distributed init (2 local devices -> 4 global),
host_shard of a deterministic toy corpus, ONE DP train step of the
PRODUCTION pjit step over the global ('data') mesh — each host feeding only
its shard of the global batch — then process 0 saves the (replicated)
updated params + loss for the parent to compare against a single-process
run."""

import sys

import jax

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]
out_path = sys.argv[4]

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nproc, process_id=pid)
assert jax.process_count() == nproc
assert jax.device_count() == 2 * nproc

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

sys.path.insert(0, "/root/repo")

from vag_nmt_tpu.core.config import preset
from vag_nmt_tpu.parallel.sharding import DATA_AXIS, host_shard, make_mesh
from vag_nmt_tpu.train.state import create_train_state
from vag_nmt_tpu.train.step import make_train_step

from tests.dist_common import make_global_batch

cfg = preset("toy").replace(model=dict(multimodal=False))
B = 8

# host_shard splits the corpus rows i::nproc; the global batch is the
# concatenation of the per-host shards, so each host's rows are the
# contiguous block its devices own under the 'data' sharding.
rows = list(range(B))
my_rows = host_shard(rows)                      # uses jax.process_index()
assert my_rows == rows[pid::nproc]
global_order = [r for p in range(nproc) for r in rows[p::nproc]]
batch_np = make_global_batch(cfg, global_order)

mesh = make_mesh(n_data=2 * nproc, n_model=1)
row_sh = NamedSharding(mesh, P(DATA_AXIS))


def to_global(a):
    n_local = len(my_rows)
    local = a[pid * n_local:(pid + 1) * n_local]
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, P(*((DATA_AXIS,) + (None,) * (a.ndim - 1)))),
        local, a.shape)


batch = {k: to_global(v) for k, v in batch_np.items()}

state = create_train_state(jax.random.key(cfg.train.seed), cfg)
step_fn, state_sh = make_train_step(cfg, mesh, state, batch)
state = jax.device_put(state, state_sh)
base_rng = jax.random.key(cfg.train.seed + 1)
state, aux = step_fn(state, batch, base_rng)

loss = float(np.asarray(jax.device_get(aux["loss"])))
if pid == 0:
    leaves = jax.tree.leaves(jax.device_get(state.params))
    np.savez(out_path, loss=np.float32(loss),
             **{f"p{i}": np.asarray(a) for i, a in enumerate(leaves)})
print(f"proc {pid}: loss={loss:.6f} OK", flush=True)
