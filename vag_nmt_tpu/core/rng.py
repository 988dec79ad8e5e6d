"""Deterministic RNG plumbing.

Every parameter / dropout site derives its key by folding a stable string path
into the root key, so adding a parameter never reshuffles the init of existing
ones (unlike sequential `split` chains)."""

from __future__ import annotations

import zlib

import jax


def key_for(root: jax.Array, path: str) -> jax.Array:
    """Derive a subkey from a stable string path."""
    return jax.random.fold_in(root, zlib.crc32(path.encode("utf-8")) & 0x7FFFFFFF)


def root_key(seed: int) -> jax.Array:
    return jax.random.key(seed)
