"""Fused decoder-scan Pallas kernel vs the lax.scan oracle (SURVEY.md C8,
VERDICT r3 item 6).

On CPU these run the Pallas interpreter — same kernel code path as the TPU
Mosaic compile, minus hardware tiling. TPU-compiled numerics were verified on
the real chip during development (fp32 forward matched the oracle bitwise at
tiny shapes; at 512-d production shapes fwd/grads agree to rel ~1e-3, fp32
association noise through the Tt-step recurrence) and are re-exercised by
the driver's bench/entry runs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vag_nmt_tpu.core.config import ModelConfig
from vag_nmt_tpu.models import decoder as dec


def _setup(B=4, Tt=6, T=5, V=50, E=12, He=10, H=16, A=8, seed=0,
           compute_dtype="float32"):
    base = dict(tgt_vocab_size=V, emb_dim=E, hidden_dim=He, dec_hidden_dim=H,
                attn_dim=A, dropout=0.0, compute_dtype=compute_dtype)
    cfgs = {impl: ModelConfig(**base, dec_scan_impl=impl)
            for impl in ("xla", "pallas")}
    params = dec.init_decoder(jax.random.key(seed), cfgs["xla"])
    rng = np.random.RandomState(seed)
    dt = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
    tgt_in = jnp.asarray(rng.randint(0, V, (B, Tt)), jnp.int32)
    s0 = jnp.asarray(rng.randn(B, H).astype(np.float32), dt)
    ctx = jnp.asarray(rng.randn(B, T, 2 * He).astype(np.float32), dt)
    lens = rng.randint(1, T + 1, B)
    mask = jnp.asarray((np.arange(T)[None] < lens[:, None]).astype(np.float32))
    return cfgs, params, tgt_in, s0, ctx, mask


def _logits(cfg, params, tgt_in, s0, ctx, mask):
    return dec.teacher_forced_logits(params, cfg, tgt_in, s0, ctx, mask)


@pytest.mark.parametrize("Tt", [6, 8])   # kt falls back 2 / picks 8's divisor
def test_forward_matches_xla_oracle(Tt):
    cfgs, params, tgt_in, s0, ctx, mask = _setup(Tt=Tt)
    lx = _logits(cfgs["xla"], params, tgt_in, s0, ctx, mask)
    lp = _logits(cfgs["pallas"], params, tgt_in, s0, ctx, mask)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lx),
                               rtol=1e-5, atol=1e-5)


def test_gradients_match_xla_oracle():
    cfgs, params, tgt_in, s0, ctx, mask = _setup()

    def loss(cfg):
        def f(params, s0, ctx):
            lg = _logits(cfg, params, tgt_in, s0, ctx, mask)
            w = jnp.arange(1, lg.shape[1] + 1, dtype=jnp.float32)[None, :, None]
            return (jnp.tanh(lg) * w).sum()
        return f

    gx = jax.grad(loss(cfgs["xla"]), argnums=(0, 1, 2))(params, s0, ctx)
    gp = jax.grad(loss(cfgs["pallas"]), argnums=(0, 1, 2))(params, s0, ctx)
    flat_x, _ = jax.tree_util.tree_flatten_with_path(gx)
    flat_p, _ = jax.tree.flatten(gp)
    for (path, ax), ap in zip(flat_x, flat_p):
        ax, ap = np.asarray(ax), np.asarray(ap)
        scale = max(np.abs(ax).max(), 1e-8)
        np.testing.assert_allclose(
            ap, ax, rtol=0, atol=2e-5 * scale,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


def test_bf16_streams_close_to_fp32_oracle():
    """Under bfloat16 compute the kernel streams bf16 but carries the state
    fp32 — results must stay within bf16 tolerance of the fp32-math path."""
    cfgs, params, tgt_in, s0, ctx, mask = _setup(compute_dtype="bfloat16")
    cfg32 = ModelConfig(**{**cfgs["xla"].__dict__, "compute_dtype": "float32",
                           "dec_scan_impl": "xla"})
    lp = _logits(cfgs["pallas"], params, tgt_in, s0,
                 ctx.astype(jnp.bfloat16), mask)
    lx = _logits(cfg32, params, tgt_in, s0, ctx.astype(jnp.float32), mask)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lx),
                               rtol=0.05, atol=0.15)


def test_sharded_scan_matches_single_device():
    """shard_map'ed kernel over an 8-device 'data' mesh ≡ unsharded oracle:
    logits AND grads (incl. the psum'ed replicated weight grads)."""
    from vag_nmt_tpu.ops.pallas_gru import shard_mesh
    from vag_nmt_tpu.parallel.sharding import make_mesh

    cfgs, params, tgt_in, s0, ctx, mask = _setup(B=16)
    mesh = make_mesh(n_data=8, n_model=1)

    with shard_mesh(mesh):
        lp = _logits(cfgs["pallas"], params, tgt_in, s0, ctx, mask)
    lx = _logits(cfgs["xla"], params, tgt_in, s0, ctx, mask)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lx),
                               rtol=1e-5, atol=1e-5)

    def loss(cfg, mesh_ctx):
        def f(params, s0, ctx):
            with shard_mesh(mesh_ctx):
                lg = _logits(cfg, params, tgt_in, s0, ctx, mask)
            return (jnp.tanh(lg)).sum()
        return f

    g_ref = jax.grad(loss(cfgs["xla"], None), argnums=(0, 1, 2))(
        params, s0, ctx)
    g_dp = jax.grad(loss(cfgs["pallas"], mesh), argnums=(0, 1, 2))(
        params, s0, ctx)
    flat_x, _ = jax.tree_util.tree_flatten_with_path(g_ref)
    flat_p, _ = jax.tree.flatten(g_dp)
    for (path, ax), ap in zip(flat_x, flat_p):
        ax, ap = np.asarray(ax), np.asarray(ap)
        scale = max(np.abs(ax).max(), 1e-8)
        np.testing.assert_allclose(
            ap, ax, rtol=0, atol=2e-5 * scale,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


def test_sharded_scan_rejects_indivisible_batch():
    from vag_nmt_tpu.ops.pallas_gru import shard_mesh
    from vag_nmt_tpu.parallel.sharding import make_mesh

    cfgs, params, tgt_in, s0, ctx, mask = _setup(B=6)
    mesh = make_mesh(n_data=8, n_model=1)
    with pytest.raises(ValueError, match="divisible"):
        with shard_mesh(mesh):
            _logits(cfgs["pallas"], params, tgt_in, s0, ctx, mask)


def test_full_loss_path_with_dropout_runs():
    """loss_fn with train=True routes dropout outside the kernel; the pallas
    path must compose with it (grad through the full multimodal loss)."""
    from vag_nmt_tpu.models import model as m

    base = dict(tgt_vocab_size=40, emb_dim=12, hidden_dim=10,
                dec_hidden_dim=16, attn_dim=8, dropout=0.3, multimodal=True,
                src_vocab_size=30)
    cfg = ModelConfig(**base, dec_scan_impl="pallas")
    params = m.init_params(jax.random.key(0), cfg)
    rng = np.random.RandomState(0)
    B, T, Tt = 4, 5, 6
    batch = {
        "src": jnp.asarray(rng.randint(1, 30, (B, T)), jnp.int32),
        "src_mask": jnp.ones((B, T), jnp.float32),
        "tgt_in": jnp.asarray(rng.randint(1, 40, (B, Tt)), jnp.int32),
        "tgt_out": jnp.asarray(rng.randint(1, 40, (B, Tt)), jnp.int32),
        "tgt_mask": jnp.ones((B, Tt), jnp.float32),
        "img": jnp.asarray(rng.randn(B, 2048).astype(np.float32)),
    }
    loss, aux = m.loss_fn(params, cfg, batch, rng=jax.random.key(1),
                          train=True)
    g = jax.grad(lambda p: m.loss_fn(p, cfg, batch, rng=jax.random.key(1),
                                     train=True)[0])(params)
    assert np.isfinite(float(loss))
    leaves = jax.tree.leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)


def test_odd_batch_tail_rows_match_oracle():
    """Regression (round-4 review): B > 8 not a multiple of 8 (e.g. 12).

    _pick_tb's old fallback returned a non-dividing tile of 8, so the grid
    (nb = B // 8 = 1) never computed rows 8..11 — their logits AND
    gradients were uninitialized garbage, silently. The wrapper now pads
    the batch to a multiple of 8 with edge rows (sliced off after), and
    the fallback is the always-legal full-B block."""
    cfgs, params, tgt_in, s0, ctx, mask = _setup(B=12)
    lx = _logits(cfgs["xla"], params, tgt_in, s0, ctx, mask)
    lp = _logits(cfgs["pallas"], params, tgt_in, s0, ctx, mask)
    # Per-row assert so a tail-row regression names the row it broke.
    for b in range(12):
        np.testing.assert_allclose(
            np.asarray(lp[b]), np.asarray(lx[b]), rtol=1e-5, atol=1e-5,
            err_msg=f"row {b} diverged (tail-row coverage regression)")

    def loss(cfg):
        def f(params, s0, ctx):
            lg = _logits(cfg, params, tgt_in, s0, ctx, mask)
            return (jnp.tanh(lg)).sum()
        return f

    gx = jax.grad(loss(cfgs["xla"]), argnums=(1, 2))(params, s0, ctx)
    gp = jax.grad(loss(cfgs["pallas"]), argnums=(1, 2))(params, s0, ctx)
    for ax, ap in zip(jax.tree.leaves(gx), jax.tree.leaves(gp)):
        ax, ap = np.asarray(ax), np.asarray(ap)
        scale = max(np.abs(ax).max(), 1e-8)
        np.testing.assert_allclose(ap, ax, rtol=0, atol=2e-5 * scale)
