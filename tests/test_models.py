import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vag_nmt_tpu.core.config import preset
from vag_nmt_tpu.models import init_params, loss_fn, prepare_decode
from vag_nmt_tpu.models.vse import max_margin_loss
from vag_nmt_tpu.utils.pytree import param_count


def make_batch(cfg, B=4, T=6, Tt=7, seed=0, multimodal=None):
    m = cfg.model
    rng = np.random.RandomState(seed)
    src = rng.randint(4, m.src_vocab_size, (B, T)).astype(np.int32)
    src_lens = rng.randint(2, T + 1, B)
    src_mask = (np.arange(T)[None, :] < src_lens[:, None]).astype(np.float32)
    src = np.where(src_mask > 0, src, 0).astype(np.int32)
    tgt = rng.randint(4, m.tgt_vocab_size, (B, Tt)).astype(np.int32)
    tgt_lens = rng.randint(2, Tt, B)
    tgt_in = np.full((B, Tt), 0, np.int32)
    tgt_out = np.full((B, Tt), 0, np.int32)
    tgt_in[:, 0] = 2  # sos
    for i in range(B):
        L = tgt_lens[i]
        tgt_in[i, 1:L] = tgt[i, : L - 1]
        tgt_out[i, : L - 1] = tgt[i, : L - 1]
        tgt_out[i, L - 1] = 3  # eos
    tgt_mask = (np.arange(Tt)[None, :] < tgt_lens[:, None]).astype(np.float32)
    batch = {
        "src": jnp.asarray(src),
        "src_mask": jnp.asarray(src_mask),
        "tgt_in": jnp.asarray(tgt_in),
        "tgt_out": jnp.asarray(tgt_out),
        "tgt_mask": jnp.asarray(tgt_mask),
    }
    if multimodal if multimodal is not None else m.multimodal:
        batch["img"] = jnp.asarray(
            rng.randn(B, m.img_feat_dim).astype(np.float32))
    return batch


@pytest.fixture(scope="module")
def toy_cfg():
    return preset("toy")


def test_loss_runs_and_grads_finite_multimodal(toy_cfg):
    m = toy_cfg.model
    params = init_params(jax.random.key(0), m)
    batch = make_batch(toy_cfg)

    def f(p):
        loss, aux = loss_fn(p, m, batch, jax.random.key(1), train=True)
        return loss

    loss, grads = jax.value_and_grad(f)(params)
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # visual branch receives gradient
    assert float(jnp.abs(grads["vse"]["img_proj"]["w"]).sum()) > 0


def test_loss_text_only_has_no_vse(toy_cfg):
    m = toy_cfg.model.__class__(**{**toy_cfg.model.__dict__, "multimodal": False})
    params = init_params(jax.random.key(0), m)
    assert "vse" not in params
    batch = make_batch(toy_cfg, multimodal=False)
    loss, aux = loss_fn(params, m, batch, None, train=False)
    assert "vse" not in aux
    assert np.isfinite(float(loss))
    assert param_count(params) > 0


def test_padding_invariance_of_loss(toy_cfg):
    """Same batch placed in a longer bucket -> identical loss (SURVEY.md §7.5)."""
    m = toy_cfg.model
    params = init_params(jax.random.key(0), m)
    batch = make_batch(toy_cfg, B=3, T=5, Tt=6)
    loss1, _ = loss_fn(params, m, batch, None, train=False)

    def pad(x, n, axis=1):
        cfgpad = [(0, 0)] * x.ndim
        cfgpad[axis] = (0, n)
        return jnp.pad(x, cfgpad)

    batch2 = dict(batch)
    for k in ("src", "src_mask"):
        batch2[k] = pad(batch[k], 4)
    for k in ("tgt_in", "tgt_out", "tgt_mask"):
        batch2[k] = pad(batch[k], 3)
    loss2, _ = loss_fn(params, m, batch2, None, train=False)
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-6)


def test_max_margin_loss_hand_computed():
    # 3x3 hand case: orthonormal-ish embeddings.
    img = np.eye(3, 4, dtype=np.float32)
    txt = np.asarray(
        [[1, 0, 0, 0], [0.6, 0.8, 0, 0], [0, 0, 0, 1]], np.float32)
    margin = 0.2
    sim = txt @ img.T
    pos = np.diag(sim)
    want_s = want_i = 0.0
    for i in range(3):
        for j in range(3):
            if i == j:
                continue
            want_s += max(0.0, margin + sim[i, j] - pos[i])
            want_i += max(0.0, margin + sim[i, j] - pos[j])
    want = (want_s + want_i) / 3.0
    got = float(max_margin_loss(jnp.asarray(img), jnp.asarray(txt), margin))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_max_margin_perfect_embeddings_zero_loss():
    e = jnp.eye(4, 8)
    assert float(max_margin_loss(e, e, margin=0.1)) == 0.0


def test_prepare_decode_shapes(toy_cfg):
    m = toy_cfg.model
    params = init_params(jax.random.key(0), m)
    batch = make_batch(toy_cfg, B=5, T=8)
    st = prepare_decode(params, m, batch)
    assert st.ctx.shape == (5, 8, m.ctx_dim)
    assert st.s0.shape == (5, m.dec_hidden_dim)
    assert st.ctx_proj.shape == (5, 8, m.attn_dim)


def test_teacher_forced_logits_match_per_step_oracle(toy_cfg):
    """The hoisted teacher-forced scan (time-parallel GRU1 gates + readout
    y-term BEFORE the scan, one batched vocab GEMM AFTER it) computes the
    same dot products as the full per-step oracle `step_from_xgates`; only
    GEMM batching/accumulation order differs, so logits must agree to fp32
    rounding."""
    from vag_nmt_tpu.models import decoder as dec
    from vag_nmt_tpu.models.layers import embed
    from vag_nmt_tpu.ops.attention import precompute_ctx_proj
    from vag_nmt_tpu.ops.gru import gru_gates_from_x

    m = toy_cfg.model
    params = init_params(jax.random.key(0), m)
    batch = make_batch(toy_cfg, B=4, T=6, Tt=7, seed=5)
    st = prepare_decode(params, m, batch)
    dp = params["decoder"]

    fused = dec.teacher_forced_logits(
        dp, m, batch["tgt_in"], st.s0, st.ctx, batch["src_mask"],
        train=False, rng=None)

    ctx_proj = precompute_ctx_proj(dp["attn"], st.ctx)
    s = st.s0
    per_step = []
    for t in range(batch["tgt_in"].shape[1]):
        y_t = embed(dp["embed"], batch["tgt_in"][:, t]).astype(st.ctx.dtype)
        xg_t = gru_gates_from_x(dp["gru1"], y_t)
        s, logits_t, _ = dec.step_from_xgates(
            dp, m, y_t, xg_t, s, st.ctx, ctx_proj, batch["src_mask"])
        per_step.append(logits_t)
    oracle = jnp.stack(per_step, axis=1)

    np.testing.assert_allclose(np.asarray(fused), np.asarray(oracle),
                               rtol=2e-5, atol=2e-5)


def test_two_layer_encoder_and_decode_shapes():
    """m30k_scaled topology (2-layer bi-GRU) end to end at toy dims."""
    from vag_nmt_tpu.core.config import preset
    from vag_nmt_tpu.decode.beam import beam_search
    from vag_nmt_tpu.models import init_params, loss_fn, prepare_decode

    cfg = preset("toy").replace(model=dict(enc_layers=2)).model
    params = init_params(jax.random.key(0), cfg)
    batch = make_batch(preset("toy").replace(model=dict(enc_layers=2)),
                       B=4, T=6, seed=0)
    loss, aux = loss_fn(params, cfg, batch, None, train=False)
    assert np.isfinite(float(loss))
    state = prepare_decode(params, cfg, batch)
    res = beam_search(params, cfg, state, beam_size=3, max_len=8)
    assert res.best_tokens.shape == (4, 8)
