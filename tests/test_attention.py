import jax
import jax.numpy as jnp
import numpy as np

from vag_nmt_tpu.ops.attention import (
    bahdanau_attend,
    bahdanau_attend_beams,
    init_attention_params,
    masked_softmax,
    precompute_ctx_proj,
)


def test_beam_attention_matches_tiled_attention():
    """The beam-axis formulation (ctx shared across beams) must equal tiling
    ctx to B*K rows and running the flat attention."""
    B, K, T, C, H, A = 3, 4, 6, 8, 5, 7
    rng = np.random.RandomState(0)
    params = init_attention_params(jax.random.key(0), C, H, A)
    ctx = jnp.asarray(rng.randn(B, T, C).astype(np.float32))
    q = jnp.asarray(rng.randn(B, K, H).astype(np.float32))
    lens = rng.randint(1, T + 1, B)
    mask = jnp.asarray((np.arange(T)[None] < lens[:, None]).astype(np.float32))
    proj = precompute_ctx_proj(params, ctx)

    c_beam, w_beam = bahdanau_attend_beams(params, q, ctx, proj, mask)

    tile = lambda x: jnp.repeat(x, K, axis=0)
    c_flat, w_flat = bahdanau_attend(
        params, q.reshape(B * K, H), tile(ctx), tile(proj), tile(mask))
    np.testing.assert_allclose(np.asarray(c_beam).reshape(B * K, C),
                               np.asarray(c_flat), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(w_beam).reshape(B * K, T),
                               np.asarray(w_flat), rtol=1e-5, atol=1e-6)


def test_masked_softmax_zero_on_pads():
    scores = jnp.asarray([[1.0, 2.0, 3.0, 4.0]])
    mask = jnp.asarray([[1.0, 1.0, 0.0, 0.0]])
    w = masked_softmax(scores, mask)
    np.testing.assert_allclose(np.asarray(w[0, 2:]), 0.0, atol=1e-12)
    np.testing.assert_allclose(float(w.sum()), 1.0, rtol=1e-6)


def test_attention_ignores_padded_positions():
    p = init_attention_params(jax.random.key(0), ctx_dim=8, query_dim=6, attn_dim=5)
    rng = np.random.RandomState(0)
    ctx = rng.randn(2, 4, 8).astype(np.float32)
    q = rng.randn(2, 6).astype(np.float32)
    mask = np.asarray([[1, 1, 1, 0], [1, 1, 0, 0]], np.float32)

    c1, w1 = bahdanau_attend(p, jnp.asarray(q), jnp.asarray(ctx),
                             precompute_ctx_proj(p, jnp.asarray(ctx)),
                             jnp.asarray(mask))
    # Corrupt padded positions — result must not change.
    ctx2 = ctx.copy()
    ctx2[0, 3] = 99.0
    ctx2[1, 2:] = -99.0
    c2, w2 = bahdanau_attend(p, jnp.asarray(q), jnp.asarray(ctx2),
                             precompute_ctx_proj(p, jnp.asarray(ctx2)),
                             jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2), atol=1e-5)


def test_attention_weights_sum_to_one_over_real_tokens():
    p = init_attention_params(jax.random.key(1), ctx_dim=8, query_dim=6, attn_dim=5)
    rng = np.random.RandomState(1)
    ctx = jnp.asarray(rng.randn(3, 5, 8).astype(np.float32))
    q = jnp.asarray(rng.randn(3, 6).astype(np.float32))
    mask = jnp.asarray(np.asarray([[1, 1, 1, 1, 1],
                                   [1, 1, 1, 0, 0],
                                   [1, 0, 0, 0, 0]], np.float32))
    _, w = bahdanau_attend(p, q, ctx, precompute_ctx_proj(p, ctx), mask)
    np.testing.assert_allclose(np.asarray(w.sum(-1)), 1.0, rtol=1e-5)
    assert np.all(np.asarray(w) * (1 - np.asarray(mask)) == 0)
