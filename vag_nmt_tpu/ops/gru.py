"""GRU cell + masked scans, TPU-first.

The reference reaches cuDNN's fused GRU through stock PyTorch ``nn.GRU``
(SURVEY.md C4/C8); there is no first-party kernel to port. The TPU-native
design factors the recurrence so the MXU sees large batched matmuls:

1. the input projection ``x_t @ Wi`` for ALL timesteps is ONE (B*T, E)x(E, 3H)
   matmul outside the scan (time-parallel — it does not depend on h);
2. the scan body does only the (B, H)x(H, 3H) recurrent matmul + VPU gates.

Gate convention matches cuDNN/PyTorch (reset gate applied AFTER the hidden
matmul), so a torch/numpy oracle with identical weights agrees to ~1e-6 fp32:

    r = sigmoid(xr + hr);  z = sigmoid(xz + hz)
    n = tanh(xn + r * hn)
    h' = (1 - z) * n + z * h

Padding uses the mask-carry trick: at masked steps the state is carried
through unchanged, so bucket padding never perturbs the final state and the
same sentence produces identical states in any bucket (tested).

``gru_scan(..., impl="pallas")`` dispatches to the fused Pallas TPU kernel in
``ops/pallas_gru.py``; ``impl="xla"`` is the lax.scan oracle and the CPU path.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from vag_nmt_tpu.core.rng import key_for

Params = Dict[str, jnp.ndarray]


def init_gru_params(key: jax.Array, in_dim: int, hidden: int, path: str = "gru",
                    dtype=jnp.float32) -> Params:
    """Glorot input weights, orthogonal recurrent weights, zero biases."""
    k_wi = key_for(key, path + "/wi")
    k_uh = key_for(key, path + "/uh")
    wi = jax.nn.initializers.glorot_uniform()(k_wi, (in_dim, 3 * hidden), dtype)
    # Orthogonal per-gate blocks for the recurrent matrix.
    blocks = [
        jax.nn.initializers.orthogonal()(jax.random.fold_in(k_uh, g),
                                         (hidden, hidden), dtype)
        for g in range(3)
    ]
    uh = jnp.concatenate(blocks, axis=1)
    return {
        "wi": wi,
        "bi": jnp.zeros((3 * hidden,), dtype),
        "uh": uh,
        "bh": jnp.zeros((3 * hidden,), dtype),
    }


def _split3(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    h = x.shape[-1] // 3
    return x[..., :h], x[..., h:2 * h], x[..., 2 * h:]


def gru_gates_from_x(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Time-parallel input projection: (..., E) -> (..., 3H). One MXU matmul."""
    return jnp.dot(x, params["wi"], preferred_element_type=jnp.float32) + params["bi"]


def gru_cell_from_gates(xg: jnp.ndarray, hg: jnp.ndarray,
                        h: jnp.ndarray) -> jnp.ndarray:
    """Gate nonlinearity given BOTH precomputed gate sets (biases included).
    xg/hg: (N, 3H), h: (N, H). Lets callers fuse the hidden-gate matmul
    with other same-input matmuls (decode fast path)."""
    xr, xz, xn = _split3(xg)
    hr, hz, hn = _split3(hg)
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    return ((1.0 - z) * n + z * h.astype(n.dtype)).astype(h.dtype)


def gru_cell_from_xgates(params: Params, xg: jnp.ndarray,
                         h: jnp.ndarray) -> jnp.ndarray:
    """One step given precomputed input gates. xg: (N, 3H), h: (N, H)."""
    hg = jnp.dot(h, params["uh"], preferred_element_type=jnp.float32) + params["bh"]
    return gru_cell_from_gates(xg, hg, h)


def gru_cell(params: Params, x: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    """One full GRU step. x: (N, E), h: (N, H) -> (N, H)."""
    return gru_cell_from_xgates(params, gru_gates_from_x(params, x), h)


def gru_scan(
    params: Params,
    x: jnp.ndarray,            # (B, T, E)
    mask: jnp.ndarray,         # (B, T) 1.0 at real tokens, 0.0 at pads
    h0: Optional[jnp.ndarray] = None,   # (B, H)
    *,
    reverse: bool = False,
    impl: str = "xla",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Masked unidirectional GRU over time.

    Returns (states (B, T, H), final state (B, H)). At masked steps the carry
    is held, so `final` is the state at the last (first, if reverse) real
    token. Output rows at masked steps equal the carried state; downstream
    attention masks them anyway.
    """
    B, T, _ = x.shape
    H = params["uh"].shape[0]
    if h0 is None:
        h0 = jnp.zeros((B, H), x.dtype)

    if impl == "auto":
        # Measured on 1xv5e (benchmarks/kernel_bench.py, amortized over 100
        # in-graph calls): the Pallas kernel is ~equal to the XLA scan
        # forward (0.82-1.03x time) and 8-27% FASTER forward+backward at
        # flagship shapes (B=64/128, T=16/32, H=512), fp32 and bf16. CPU has
        # no Mosaic backend, so 'auto' keeps the lax.scan oracle there.
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas":
        from vag_nmt_tpu.ops.pallas_gru import pallas_gru_scan

        return pallas_gru_scan(params, x, mask, h0, reverse=reverse)
    if impl != "xla":
        raise ValueError(f"unknown gru impl {impl!r}")

    xg = gru_gates_from_x(params, x)          # (B, T, 3H) — single big matmul
    xs = (jnp.swapaxes(xg, 0, 1), jnp.swapaxes(mask, 0, 1)[..., None])

    def step(h, inp):
        xg_t, m_t = inp
        h_new = gru_cell_from_xgates(params, xg_t, h)
        h = jnp.where(m_t > 0, h_new, h)
        return h, h

    h_last, hs = jax.lax.scan(step, h0, xs, reverse=reverse)
    return jnp.swapaxes(hs, 0, 1), h_last


def bidirectional_gru(
    params_fwd: Params,
    params_bwd: Params,
    x: jnp.ndarray,
    mask: jnp.ndarray,
    *,
    impl: str = "xla",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Bidirectional layer. Returns (states (B,T,2H), h_fwd (B,H), h_bwd (B,H))."""
    out_f, h_f = gru_scan(params_fwd, x, mask, reverse=False, impl=impl)
    out_b, h_b = gru_scan(params_bwd, x, mask, reverse=True, impl=impl)
    return jnp.concatenate([out_f, out_b], axis=-1), h_f, h_b
