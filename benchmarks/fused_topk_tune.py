"""Tuning sweep for ops/pallas_readout_topk at the production decode shape
(B=128, K=5, V=8000, E=256, bf16 weights). Fetch-delta timing
(benchmarks/topk_bench.py methodology). Run ON TPU."""

from __future__ import annotations

import itertools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

REPS = 200


from benchmarks._timing import bench_delta as _bench_delta


def bench_delta(make_run, *args, warmup=1, iters=7):
    """See benchmarks/_timing.py (shared fetch-delta methodology)."""
    return _bench_delta(make_run, *args, reps=REPS, warmup=warmup,
                        iters=iters)


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/vag_nmt_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    from vag_nmt_tpu.ops.pallas_readout_topk import fused_readout_topk

    B, K, V, E = 128, 5, 8000, 256
    rng = np.random.RandomState(0)
    t = jnp.asarray(rng.randn(B * K, E), jnp.bfloat16)
    w = jnp.asarray(rng.randn(E, V), jnp.bfloat16)
    b = jnp.asarray(rng.randn(V), jnp.float32)
    scores = jnp.asarray(rng.randn(B, K), jnp.float32)
    finished = jnp.asarray(rng.rand(B, K) < 0.2)

    def make(tv, direct, slots=0):
        def mk(n):
            @jax.jit
            def run(sc):
                def body(i, c):
                    v, idx = fused_readout_topk(
                        t, w, b, c, finished, impl="pallas", tv=tv,
                        direct=direct, slots=slots)
                    return c * 0.9 + v * 0.1 + idx.astype(jnp.float32) * 1e-9
                return jax.lax.fori_loop(0, n, body, sc)
            return run
        return mk

    for tv, direct in itertools.product([512, 1024, 2048], [True, False]):
        try:
            dt = bench_delta(make(tv, direct), scores)
            print(f"tv={tv:5d} direct={direct!s:5s}  {dt * 1e6:8.1f} us",
                  flush=True)
        except Exception as e:
            print(f"tv={tv:5d} direct={direct!s:5s}  FAILED "
                  f"{type(e).__name__}: {str(e)[:120]}", flush=True)

    # Slot-depth sweep at the default tv/direct: the per-step lax.cond
    # exactness fallback reruns with depth K when the watermark fires, so
    # lower depths trade cascade VPU ops against rerun frequency (random
    # logits fire ~never for sk>=3; in-context firing is what
    # benchmarks/defer_ab.py measures).
    for slots in (2, 3, 4, 5):
        try:
            dt = bench_delta(make(512, True, slots), scores)
            print(f"slots={slots}  tv=512 direct=True  {dt * 1e6:8.1f} us",
                  flush=True)
        except Exception as e:
            print(f"slots={slots}  FAILED {type(e).__name__}: {str(e)[:120]}",
                  flush=True)


if __name__ == "__main__":
    main()
