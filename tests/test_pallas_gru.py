"""Pallas GRU scan vs the XLA lax.scan oracle (SURVEY.md §4, §7 hard part 2).

On CPU these run the Pallas interpreter — same kernel code path as the TPU
Mosaic compile, minus hardware tiling. TPU-compiled numerics are exercised by
the driver's bench/entry runs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vag_nmt_tpu.ops.gru import gru_scan, init_gru_params
from vag_nmt_tpu.ops.pallas_gru import pallas_gru_scan


def _setup(B=8, T=12, E=16, H=32, seed=0):
    key = jax.random.key(seed)
    params = init_gru_params(key, E, H, "t")
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(B, T, E).astype(np.float32))
    lens = rng.randint(1, T + 1, B)
    mask = jnp.asarray((np.arange(T)[None, :] < lens[:, None]).astype(np.float32))
    h0 = jnp.zeros((B, H), jnp.float32)
    return params, x, mask, h0


@pytest.mark.parametrize("reverse", [False, True])
def test_forward_matches_xla_oracle(reverse):
    params, x, mask, h0 = _setup()
    hs_ref, hl_ref = gru_scan(params, x, mask, h0, reverse=reverse, impl="xla")
    hs, hl = pallas_gru_scan(params, x, mask, h0, reverse=reverse)
    np.testing.assert_allclose(np.asarray(hs), np.asarray(hs_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hl), np.asarray(hl_ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("reverse", [False, True])
def test_gradients_match_xla_oracle(reverse):
    params, x, mask, h0 = _setup(B=8, T=7, E=8, H=16)

    def loss(impl):
        def f(params, x, h0):
            hs, hl = gru_scan(params, x, mask, h0, reverse=reverse, impl=impl)
            # weight states by position so the grad isn't uniform
            w = jnp.arange(1, hs.shape[1] + 1, dtype=jnp.float32)[None, :, None]
            return (hs * w).sum() + 2.0 * (hl ** 2).sum()
        return f

    g_ref = jax.grad(loss("xla"), argnums=(0, 1, 2))(params, x, h0)
    g_pal = jax.grad(loss("pallas"), argnums=(0, 1, 2))(params, x, h0)
    for a, b, name in [
        (g_pal[0]["wi"], g_ref[0]["wi"], "wi"),
        (g_pal[0]["bi"], g_ref[0]["bi"], "bi"),
        (g_pal[0]["uh"], g_ref[0]["uh"], "uh"),
        (g_pal[0]["bh"], g_ref[0]["bh"], "bh"),
        (g_pal[1], g_ref[1], "x"),
        (g_pal[2], g_ref[2], "h0"),
    ]:
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


@pytest.mark.parametrize("reverse", [False, True])
def test_sharded_kernel_matches_single_device(reverse):
    """shard_map'ed kernel over an 8-device 'data' mesh ≡ unsharded XLA scan:
    forward states AND grads (incl. the psum'ed replicated weight grads)."""
    from vag_nmt_tpu.ops.pallas_gru import shard_mesh
    from vag_nmt_tpu.parallel.sharding import make_mesh

    params, x, mask, h0 = _setup(B=16, T=12, E=16, H=32)
    mesh = make_mesh(n_data=8, n_model=1)

    def loss(impl, mesh_ctx):
        def f(params, x, h0):
            with shard_mesh(mesh_ctx):
                hs, hl = gru_scan(params, x, mask, h0, reverse=reverse,
                                  impl=impl)
            w = jnp.arange(1, hs.shape[1] + 1, dtype=jnp.float32)[None, :, None]
            return (hs * w).sum() + 2.0 * (hl ** 2).sum()
        return f

    with shard_mesh(mesh):
        hs, hl = gru_scan(params, x, mask, h0, reverse=reverse, impl="pallas")
    hs_ref, hl_ref = gru_scan(params, x, mask, h0, reverse=reverse, impl="xla")
    np.testing.assert_allclose(np.asarray(hs), np.asarray(hs_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hl), np.asarray(hl_ref),
                               rtol=1e-5, atol=1e-5)

    g_ref = jax.grad(loss("xla", None), argnums=(0, 1, 2))(params, x, h0)
    g_dp = jax.grad(loss("pallas", mesh), argnums=(0, 1, 2))(params, x, h0)
    for a, b, name in [
        (g_dp[0]["wi"], g_ref[0]["wi"], "wi"),
        (g_dp[0]["bi"], g_ref[0]["bi"], "bi"),
        (g_dp[0]["uh"], g_ref[0]["uh"], "uh"),
        (g_dp[0]["bh"], g_ref[0]["bh"], "bh"),
        (g_dp[1], g_ref[1], "x"),
        (g_dp[2], g_ref[2], "h0"),
    ]:
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


def test_sharded_kernel_rejects_indivisible_batch():
    from vag_nmt_tpu.ops.pallas_gru import shard_mesh
    from vag_nmt_tpu.parallel.sharding import make_mesh

    params, x, mask, h0 = _setup(B=6, T=8, E=16, H=32)
    mesh = make_mesh(n_data=8, n_model=1)
    with pytest.raises(ValueError, match="divisible"):
        with shard_mesh(mesh):
            gru_scan(params, x, mask, h0, impl="pallas")


def test_padding_invariance_pallas():
    """Same sentence in a longer bucket -> identical states at real tokens."""
    params, x, mask, h0 = _setup(B=8, T=10)
    hs1, hl1 = pallas_gru_scan(params, x, mask, h0)
    x_pad = jnp.concatenate([x, jnp.zeros((8, 6, 16), jnp.float32)], axis=1)
    m_pad = jnp.concatenate([mask, jnp.zeros((8, 6), jnp.float32)], axis=1)
    hs2, hl2 = pallas_gru_scan(params, x_pad, m_pad, h0)
    np.testing.assert_allclose(np.asarray(hs2[:, :10]), np.asarray(hs1),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(hl2), np.asarray(hl1),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("reverse", [False, True])
def test_bf16_stream_matches_oracle(reverse):
    """bf16 compute dtype: the kernel streams xg/states in bf16 (fp32 VMEM
    carry). Compare against the bf16 XLA oracle (bf16 scan carry) — both
    approximate the fp32 truth within bf16 noise, so a loose tolerance."""
    params, x, mask, h0 = _setup(B=8, T=12, E=16, H=32)
    params16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    x16 = x.astype(jnp.bfloat16)
    h016 = h0.astype(jnp.bfloat16)
    hs_ref, hl_ref = gru_scan(params16, x16, mask, h016, reverse=reverse,
                              impl="xla")
    hs, hl = pallas_gru_scan(params16, x16, mask, h016, reverse=reverse)
    assert hs.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(hs, np.float32),
                               np.asarray(hs_ref, np.float32),
                               rtol=5e-2, atol=5e-2)
    np.testing.assert_allclose(np.asarray(hl, np.float32),
                               np.asarray(hl_ref, np.float32),
                               rtol=5e-2, atol=5e-2)


def test_bf16_stream_gradients_close_to_fp32():
    """bf16-stream grads must track the fp32-stream kernel grads (fp32
    accumulation inside: weight grads should be bf16-input-rounding away)."""
    params, x, mask, h0 = _setup(B=8, T=8, E=8, H=16)
    params16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)

    def loss(x_in, h_in):
        def f(p):
            hs, hl = pallas_gru_scan(p, x_in, mask, h_in)
            w = jnp.arange(1, hs.shape[1] + 1, dtype=jnp.float32)[None, :, None]
            return (hs.astype(jnp.float32) * w).sum() \
                + 2.0 * (hl.astype(jnp.float32) ** 2).sum()
        return f

    g32 = jax.grad(loss(x, h0))(params)
    g16 = jax.grad(loss(x.astype(jnp.bfloat16),
                        h0.astype(jnp.bfloat16)))(params16)
    for name in ("wi", "bi", "uh", "bh"):
        a = np.asarray(g16[name], np.float32)
        b = np.asarray(g32[name], np.float32)
        denom = max(1.0, float(np.abs(b).max()))
        assert np.abs(a - b).max() / denom < 6e-2, name
