"""GRU kernels vs a pure-numpy oracle (SURVEY.md §4 unit-test plan)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vag_nmt_tpu.ops.gru import (
    bidirectional_gru,
    gru_cell,
    gru_scan,
    init_gru_params,
)


def np_gru_cell(p, x, h):
    """cuDNN/PyTorch-convention GRU cell in numpy (fp64 for a tight oracle)."""
    x = x.astype(np.float64)
    h = h.astype(np.float64)
    xg = x @ np.asarray(p["wi"], np.float64) + np.asarray(p["bi"], np.float64)
    hg = h @ np.asarray(p["uh"], np.float64) + np.asarray(p["bh"], np.float64)
    H = h.shape[-1]
    xr, xz, xn = xg[:, :H], xg[:, H:2 * H], xg[:, 2 * H:]
    hr, hz, hn = hg[:, :H], hg[:, H:2 * H], hg[:, 2 * H:]
    sig = lambda v: 1.0 / (1.0 + np.exp(-v))
    r, z = sig(xr + hr), sig(xz + hz)
    n = np.tanh(xn + r * hn)
    return (1.0 - z) * n + z * h


@pytest.fixture(scope="module")
def params():
    return init_gru_params(jax.random.key(0), in_dim=12, hidden=16)


def test_cell_matches_numpy_oracle(params):
    rng = np.random.RandomState(0)
    x = rng.randn(5, 12).astype(np.float32)
    h = rng.randn(5, 16).astype(np.float32)
    got = gru_cell(params, jnp.asarray(x), jnp.asarray(h))
    want = np_gru_cell(params, x, h)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_scan_matches_stepwise_oracle(params):
    rng = np.random.RandomState(1)
    B, T = 3, 7
    x = rng.randn(B, T, 12).astype(np.float32)
    mask = np.ones((B, T), np.float32)
    out, h_last = gru_scan(params, jnp.asarray(x), jnp.asarray(mask))
    h = np.zeros((B, 16))
    for t in range(T):
        h = np_gru_cell(params, x[:, t], h)
        np.testing.assert_allclose(np.asarray(out[:, t]), h, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_last), h, atol=1e-5)


def test_mask_carry_padding_invariance(params):
    """Same sentence in a longer bucket -> identical real-position states and
    final state (SURVEY.md §7 hard part 5)."""
    rng = np.random.RandomState(2)
    B, T = 2, 5
    x = rng.randn(B, T, 12).astype(np.float32)
    mask = np.ones((B, T), np.float32)
    out_s, h_s = gru_scan(params, jnp.asarray(x), jnp.asarray(mask))

    pad = 4
    x_p = np.concatenate([x, rng.randn(B, pad, 12).astype(np.float32)], axis=1)
    mask_p = np.concatenate([mask, np.zeros((B, pad), np.float32)], axis=1)
    out_p, h_p = gru_scan(params, jnp.asarray(x_p), jnp.asarray(mask_p))

    np.testing.assert_allclose(np.asarray(h_p), np.asarray(h_s), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out_p[:, :T]), np.asarray(out_s), atol=1e-6
    )


def test_reverse_scan_equals_flipped_forward(params):
    rng = np.random.RandomState(3)
    B, T = 2, 6
    x = rng.randn(B, T, 12).astype(np.float32)
    mask = np.ones((B, T), np.float32)
    out_r, h_r = gru_scan(params, jnp.asarray(x), jnp.asarray(mask), reverse=True)
    out_f, h_f = gru_scan(
        params, jnp.asarray(x[:, ::-1].copy()), jnp.asarray(mask)
    )
    np.testing.assert_allclose(np.asarray(h_r), np.asarray(h_f), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out_r), np.asarray(out_f[:, ::-1]), atol=1e-6
    )


def test_reverse_scan_trailing_pads_are_transparent(params):
    """Reverse direction must skip trailing pads: final state == state at t=0
    of the unpadded sequence."""
    rng = np.random.RandomState(4)
    x = rng.randn(1, 4, 12).astype(np.float32)
    mask = np.ones((1, 4), np.float32)
    _, h_short = gru_scan(params, jnp.asarray(x), jnp.asarray(mask), reverse=True)

    x_p = np.concatenate([x, rng.randn(1, 3, 12).astype(np.float32)], axis=1)
    mask_p = np.concatenate([mask, np.zeros((1, 3), np.float32)], axis=1)
    _, h_pad = gru_scan(params, jnp.asarray(x_p), jnp.asarray(mask_p), reverse=True)
    np.testing.assert_allclose(np.asarray(h_pad), np.asarray(h_short), atol=1e-6)


def test_bidirectional_shapes_and_final_states(params):
    p_bwd = init_gru_params(jax.random.key(1), in_dim=12, hidden=16)
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(3, 5, 12).astype(np.float32))
    mask = jnp.ones((3, 5))
    out, h_f, h_b = bidirectional_gru(params, p_bwd, x, mask)
    assert out.shape == (3, 5, 32)
    np.testing.assert_allclose(np.asarray(out[:, -1, :16]), np.asarray(h_f),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[:, 0, 16:]), np.asarray(h_b),
                               atol=1e-6)


def test_scan_is_differentiable(params):
    x = jnp.ones((2, 4, 12)) * 0.1
    mask = jnp.ones((2, 4))

    def f(p):
        out, h = gru_scan(p, x, mask)
        return jnp.sum(out) + jnp.sum(h)

    grads = jax.grad(f)(params)
    assert all(np.isfinite(np.asarray(g)).all() for g in jax.tree_util.tree_leaves(grads))
    assert float(jnp.abs(grads["wi"]).sum()) > 0
