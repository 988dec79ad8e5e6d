"""Small pytree helpers."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def param_count(params) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))


def global_norm(tree) -> jnp.ndarray:
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32))) for x in leaves))


def cast_floats(tree, dtype):
    """Cast float leaves to `dtype` (int/bool leaves untouched). Used to run
    decode in bf16: params cast ONCE per call inside jit, matmuls then hit the
    MXU as bf16 x bf16 with fp32 accumulation (preferred_element_type)."""
    def cast(x):
        if jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(cast, tree)


def tree_allclose(a, b, rtol: float = 1e-6, atol: float = 1e-6) -> bool:
    import numpy as np

    la, lb = jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
    if len(la) != len(lb):
        return False
    return all(np.allclose(np.asarray(x), np.asarray(y), rtol=rtol, atol=atol)
               for x, y in zip(la, lb))
