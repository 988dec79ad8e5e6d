"""Shared fetch-delta timing for the TPU microbenchmarks.

block_until_ready does NOT block on the tunneled axon platform, so every
harness forces a real result fetch (np.asarray) as its completion fence,
and per-call cost is the REPS-delta (t(2N) - t(N)) / N — subtracting the
fixed dispatch/fetch tail that would otherwise swamp microsecond kernels.
MIN statistics over iters at both endpoints: the tunnel adds one-sided
jitter up to tens of ms. One definition here instead of one drifting copy
per benchmark (review finding: four copies had already diverged in iters
and fetch style)."""

from __future__ import annotations

import time

import numpy as np

try:
    import jax
except ImportError:                      # pragma: no cover
    jax = None


def _fetch(x):
    if jax is not None:
        return jax.tree.map(np.asarray, x)
    return np.asarray(x)


def bench_delta(make_run, *args, reps: int, warmup: int = 1,
                iters: int = 9) -> float:
    """Seconds per call of the op inside `make_run(n)`'s n-times loop."""
    run_n, run_2n = make_run(reps), make_run(2 * reps)
    for _ in range(warmup):
        _fetch(run_n(*args))
        _fetch(run_2n(*args))
    t1s, t2s = [], []
    for _ in range(iters):
        t0 = time.perf_counter()
        _fetch(run_n(*args))
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        _fetch(run_2n(*args))
        t2s.append(time.perf_counter() - t0)
    return (min(t2s) - min(t1s)) / reps
