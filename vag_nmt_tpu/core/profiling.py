"""Tracing/profiling hooks (SURVEY.md §5: the reference has none; here the
TPU-native equivalent is a `jax.profiler` trace you can open in TensorBoard /
Perfetto, plus named step annotations).

Usage:
    with maybe_trace(trace_dir):          # no-op when trace_dir is falsy
        ... jitted work ...

    with step_annotation("train_step"):   # labels ops in the trace timeline
        state, aux = step_fn(...)
"""

from __future__ import annotations

import contextlib
from typing import Iterator, Optional


@contextlib.contextmanager
def maybe_trace(trace_dir: Optional[str]) -> Iterator[None]:
    """jax.profiler.trace(trace_dir) when set, else a no-op context."""
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield


def step_annotation(name: str):
    """Named region in the profiler timeline (TraceAnnotation)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
