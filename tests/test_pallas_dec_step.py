"""Fused beam decode-step kernel (ops/pallas_dec_step) vs the XLA step.

On CPU these run the Pallas interpreter — the same kernel code path as the
TPU Mosaic compile minus hardware tiling. TPU-compiled numerics were
verified on the real chip during development (fp32 matched the XLA tabled
step to ~1e-7 at flagship shapes) and are re-exercised by the driver's
bench/entry runs. The kernel is NOT bit-identical to the XLA step
(softmax/tanh reassociation), so these tests assert closeness vs both the
tabled path and the untabled oracle, plus exact invariants the decode
stack relies on (pad invariance, beam-architecture parity with the kernel
forced everywhere)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vag_nmt_tpu.core.config import ModelConfig
from vag_nmt_tpu.models import decoder as dec
from vag_nmt_tpu.ops.attention import precompute_ctx_proj


def _setup(B=6, K=5, T=7, V=50, E=12, He=10, H=16, A=8, seed=0):
    cfg = ModelConfig(tgt_vocab_size=V, emb_dim=E, hidden_dim=He,
                      dec_hidden_dim=H, attn_dim=A, dropout=0.0)
    params = dec.init_decoder(jax.random.key(seed), cfg)
    tables = dec.decode_tables(params)
    rng = np.random.RandomState(seed)
    tok = jnp.asarray(rng.randint(0, V, (B, K)), jnp.int32)
    s = jnp.asarray(rng.randn(B, K, H).astype(np.float32) * 0.3)
    ctx = jnp.asarray(rng.randn(B, T, 2 * He).astype(np.float32) * 0.3)
    ctxp = precompute_ctx_proj(params["attn"], ctx)
    lens = rng.randint(max(1, T // 2), T + 1, B)
    mask = jnp.asarray((np.arange(T)[None] < lens[:, None]).astype(np.float32))
    return cfg, params, tables, tok, s, ctx, ctxp, mask


def _run(cfg, params, tables, tok, s, ctx, ctxp, mask, env, monkeypatch):
    monkeypatch.setenv("VAG_DEC_STEP", env)
    return dec.decode_step_beams_readout(params, cfg, tok, s, ctx, ctxp,
                                         mask, tables)


@pytest.mark.parametrize("K", [1, 5])
def test_kernel_matches_xla_tabled_step(K, monkeypatch):
    cfg, params, tables, tok, s, ctx, ctxp, mask = _setup(K=K)
    sk, tk, wk, bk = _run(cfg, params, tables, tok, s, ctx, ctxp, mask,
                          "on", monkeypatch)
    sx, tx, wx, bx = _run(cfg, params, tables, tok, s, ctx, ctxp, mask,
                          "off", monkeypatch)
    np.testing.assert_allclose(np.asarray(sk), np.asarray(sx),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(tk), np.asarray(tx),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(wk), np.asarray(wx))
    np.testing.assert_array_equal(np.asarray(bk), np.asarray(bx))


def test_kernel_matches_untabled_oracle(monkeypatch):
    cfg, params, tables, tok, s, ctx, ctxp, mask = _setup()
    sk, tk, _, _ = _run(cfg, params, tables, tok, s, ctx, ctxp, mask,
                        "on", monkeypatch)
    monkeypatch.setenv("VAG_DEC_STEP", "on")   # no effect without tables
    so, to, _, _ = dec.decode_step_beams_readout(params, cfg, tok, s, ctx,
                                                 ctxp, mask, None)
    np.testing.assert_allclose(np.asarray(sk), np.asarray(so),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(tk), np.asarray(to),
                               rtol=1e-5, atol=1e-5)


def test_pad_columns_do_not_change_outputs(monkeypatch):
    """Extending ctx with masked pad columns must leave the step's outputs
    unchanged — the kernel applies the mask before softmax."""
    cfg, params, tables, tok, s, ctx, ctxp, mask = _setup(T=5)
    sk, tk, _, _ = _run(cfg, params, tables, tok, s, ctx, ctxp, mask,
                        "on", monkeypatch)
    pad = 3
    ctx2 = jnp.concatenate(
        [ctx, 7.7 * jnp.ones((ctx.shape[0], pad, ctx.shape[2]), ctx.dtype)],
        axis=1)
    ctxp2 = precompute_ctx_proj(params["attn"], ctx2)
    mask2 = jnp.concatenate(
        [mask, jnp.zeros((mask.shape[0], pad), mask.dtype)], axis=1)
    sk2, tk2, _, _ = _run(cfg, params, tables, tok, s, ctx2, ctxp2, mask2,
                          "on", monkeypatch)
    np.testing.assert_allclose(np.asarray(sk2), np.asarray(sk),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(tk2), np.asarray(tk),
                               rtol=1e-6, atol=1e-6)


def test_sharded_step_matches_single_device(monkeypatch):
    """shard_map'ed kernel over an 8-device 'data' mesh ≡ the unsharded
    kernel (forward-only; batch rows split, weights replicated)."""
    from vag_nmt_tpu.ops.pallas_gru import shard_mesh
    from vag_nmt_tpu.parallel.sharding import make_mesh

    cfg, params, tables, tok, s, ctx, ctxp, mask = _setup(B=16)
    mesh = make_mesh(n_data=8, n_model=1)
    s1, t1, _, _ = _run(cfg, params, tables, tok, s, ctx, ctxp, mask,
                        "on", monkeypatch)
    with shard_mesh(mesh):
        s2, t2, _, _ = _run(cfg, params, tables, tok, s, ctx, ctxp, mask,
                            "on", monkeypatch)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s1),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(t2), np.asarray(t1),
                               rtol=1e-6, atol=1e-6)


def test_sharded_step_rejects_indivisible_batch(monkeypatch):
    from vag_nmt_tpu.ops.pallas_gru import shard_mesh
    from vag_nmt_tpu.parallel.sharding import make_mesh

    cfg, params, tables, tok, s, ctx, ctxp, mask = _setup(B=6)
    with shard_mesh(make_mesh(n_data=8, n_model=1)):
        with pytest.raises(ValueError, match="divisible"):
            _run(cfg, params, tables, tok, s, ctx, ctxp, mask,
                 "on", monkeypatch)


def test_shape_envelope_gates_real_mosaic_only():
    """Outside lane-aligned dims the TPU-compiled kernel hangs on device
    (see dec_step_shapes_supported), so the envelope must reject e.g. the
    toy preset's dims when NOT interpreting — and stay permissive in
    interpret mode, where every test above runs tiny shapes."""
    from vag_nmt_tpu.ops.pallas_dec_step import dec_step_shapes_supported

    # Flagship dims: inside the envelope either way.
    assert dec_step_shapes_supported(512, 512, 1024, 512, interpret=False)
    assert dec_step_shapes_supported(512, 512, 1024, 512, interpret=True)
    # Toy dims: interpret-only.
    assert dec_step_shapes_supported(32, 32, 64, 64, interpret=True)
    assert not dec_step_shapes_supported(32, 32, 64, 64, interpret=False)


def test_beam_architectures_bit_identical_with_kernel(monkeypatch):
    """The exact-parity property the beam stack pins (plain == two-phase ==
    streaming) must survive the kernel: every architecture calls the same
    step, so forcing the kernel on changes numerics but not the
    invariant. Also checks the fused readout path (decode_step_topk's
    structure) is the one exercised, via tables."""
    from vag_nmt_tpu.core.config import preset
    from vag_nmt_tpu.decode.beam import (
        beam_search,
        beam_search_streaming,
        beam_search_two_phase,
    )
    from vag_nmt_tpu.models.model import init_params, prepare_decode
    from tests.test_models import make_batch

    monkeypatch.setenv("VAG_DEC_STEP", "on")
    cfg = preset("toy")
    m = cfg.model
    params = init_params(jax.random.key(0), m)
    batch = make_batch(cfg, B=6, T=8, seed=3)
    state = prepare_decode(params, m, batch)
    tables = dec.decode_tables(params["decoder"])
    kw = dict(beam_size=3, max_len=12, tables=tables)
    ref = beam_search(params, m, state, **kw)
    two, _, _ = beam_search_two_phase(params, m, state, chunk=3,
                                      split_len=4, **kw)
    stre, _, _ = beam_search_streaming(params, m, state, slots=3,
                                       refill_threshold=1, **kw)
    for got in (two, stre):
        np.testing.assert_array_equal(np.asarray(got.tokens),
                                      np.asarray(ref.tokens))
        np.testing.assert_array_equal(np.asarray(got.lengths),
                                      np.asarray(ref.lengths))
        np.testing.assert_allclose(np.asarray(got.scores),
                                   np.asarray(ref.scores), atol=1e-6)


def test_odd_batch_tail_rows_match_xla(monkeypatch):
    """Regression (round-4 review): B > 8 not a multiple of 8 (e.g. 12).

    _pick_tb's old fallback returned a non-dividing tile of 8, so the last
    B % 8 sentences' s_new/t outputs were never written — uninitialized
    memory fed the readout->top-k kernel silently. _call now pads the rows
    to a multiple of 8 (edge rows, sliced off after)."""
    cfg, params, tables, tok, s, ctx, ctxp, mask = _setup(B=12)
    sk, tk, _, _ = _run(cfg, params, tables, tok, s, ctx, ctxp, mask,
                        "on", monkeypatch)
    sx, tx, _, _ = _run(cfg, params, tables, tok, s, ctx, ctxp, mask,
                        "off", monkeypatch)
    sk, sx = np.asarray(sk), np.asarray(sx)
    tk = np.asarray(tk).reshape(12, -1)
    tx = np.asarray(tx).reshape(12, -1)
    for b in range(12):
        np.testing.assert_allclose(
            sk[b], sx[b], rtol=1e-5, atol=1e-5,
            err_msg=f"s_new row {b} diverged (tail-row coverage regression)")
        np.testing.assert_allclose(
            tk[b], tx[b], rtol=1e-5, atol=1e-5,
            err_msg=f"t row {b} diverged (tail-row coverage regression)")
