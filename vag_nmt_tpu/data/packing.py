"""One-buffer batch transport: pack a batch pytree into a single flat
uint8 array on the host, unpack on device INSIDE the jitted step.

Why: on links where each host->device transfer pays a large fixed latency
(measured ~10 ms per array on a tunneled v5e — a 6-leaf compact batch cost
~15 ms/step in completion terms against 1.9 ms of device compute), the
per-step feed must be ONE transfer. Packing is a host-side byte concat;
unpacking is free-at-runtime slicing + bitcasts that XLA fuses into the
step. The unpack spec (keys, dtypes, shapes) is a static jit argument, so
two different batch layouts that happen to share a byte length can never be
mis-decoded (each spec compiles its own program, exactly like shaped
batches already do)."""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Spec = Tuple[Tuple[str, str, Tuple[int, ...]], ...]


def pack_batch(batch: Dict[str, np.ndarray]) -> Tuple[np.ndarray, Spec]:
    """Host side: flatten every leaf to bytes, concatenate in sorted-key
    order. Returns (uint8 1-D array, static spec for unpack_batch)."""
    keys = sorted(batch)
    parts = []
    spec = []
    for k in keys:
        a = np.ascontiguousarray(batch[k])
        parts.append(a.view(np.uint8).reshape(-1))
        spec.append((k, a.dtype.str, tuple(a.shape)))
    return np.concatenate(parts), tuple(spec)


def unpack_batch(buf: jnp.ndarray, spec: Spec) -> Dict[str, jnp.ndarray]:
    """Device side (inside jit): static slices + bitcasts back to leaves.
    Byte order matches the host's little-endian numpy views (TPU and x86
    agree)."""
    out: Dict[str, jnp.ndarray] = {}
    off = 0
    for key, dt_str, shape in spec:
        dt = np.dtype(dt_str)
        n = int(np.prod(shape, dtype=np.int64)) * dt.itemsize if shape else \
            dt.itemsize
        seg = jax.lax.slice(buf, (off,), (off + n,))
        if dt.itemsize > 1:
            seg = jax.lax.bitcast_convert_type(
                seg.reshape(-1, dt.itemsize), jnp.dtype(dt))
        elif dt == np.bool_:
            seg = seg != 0           # bool packs as bytes 0/1
        elif dt != np.uint8:
            seg = jax.lax.bitcast_convert_type(seg, jnp.dtype(dt))  # int8
        out[key] = seg.reshape(shape)
        off += n
    if off != buf.shape[0]:
        # trace-time check, mirrors unpack_leaves_host: a stale spec whose
        # layout is a byte-prefix of the buffer would otherwise silently
        # decode wrong (but well-formed-looking) leaves
        raise ValueError(
            f"packed buffer has {buf.shape[0]} bytes but the spec describes "
            f"{off}")
    return out


def pack_leaves(leaves) -> jnp.ndarray:
    """Device side (inside jit): flatten a list of arrays to ONE 1-D uint8
    buffer (bitcast + concat — free at runtime, XLA fuses the copies).
    Counterpart of unpack_leaves_host. Why: each device->host fetch pays a
    full dispatch round trip (~31 ms measured on the tunneled v5e), so a
    program returning 3 arrays costs 3 round trips when fetched naively;
    one packed buffer = one round trip."""
    parts = []
    for a in leaves:
        if a.dtype.itemsize > 1:
            a = jax.lax.bitcast_convert_type(a, jnp.uint8)
        elif a.dtype == jnp.bool_:
            a = a.astype(jnp.uint8)
        parts.append(a.reshape(-1))
    return jnp.concatenate(parts)


def leaves_spec(shapes_dtypes) -> Spec:
    """Static spec [(name-free) dtype/shape list] for unpack_leaves_host."""
    return tuple(("", np.dtype(dt).str, tuple(sh))
                 for dt, sh in shapes_dtypes)


def unpack_leaves_host(buf: np.ndarray, spec: Spec):
    """Host side: slice the fetched uint8 buffer back into arrays."""
    total = sum(int(np.prod(shape, dtype=np.int64)) * np.dtype(dt).itemsize
                for _, dt, shape in spec)
    if total != buf.size:
        raise ValueError(f"packed buffer has {buf.size} bytes, spec consumed "
                         f"{total}")
    out = []
    off = 0
    for _, dt_str, shape in spec:
        dt = np.dtype(dt_str)
        n = int(np.prod(shape, dtype=np.int64)) * dt.itemsize
        out.append(np.frombuffer(
            buf[off:off + n].tobytes(), dtype=dt).reshape(shape))
        off += n
    return out
