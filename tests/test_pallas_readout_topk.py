"""Parity tests: ops/pallas_readout_topk.fused_readout_topk vs the unfused
beam_topk(t @ w + b) oracle (interpret mode off-TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vag_nmt_tpu.ops.pallas_readout_topk import fused_readout_topk
from vag_nmt_tpu.ops.pallas_topk import beam_topk


def _oracle(t, w, b, scores, finished, pad_id=0):
    logits = (jnp.dot(t, w, preferred_element_type=jnp.float32)
              + b.astype(jnp.float32))
    B, K = scores.shape
    return beam_topk(logits.reshape(B, K, -1), scores, finished,
                     pad_id=pad_id, impl="xla")


def _rand_case(B, K, V, E, seed=0, fin_p=0.2, dtype=np.float32):
    rng = np.random.RandomState(seed)
    t = jnp.asarray(rng.randn(B * K, E).astype(dtype))
    w = jnp.asarray(rng.randn(E, V).astype(dtype))
    b = jnp.asarray(rng.randn(V).astype(np.float32))
    scores = jnp.asarray(rng.randn(B, K).astype(np.float32))
    finished = jnp.asarray(rng.rand(B, K) < fin_p)
    return t, w, b, scores, finished


@pytest.mark.parametrize("B,K,V,E", [(8, 5, 1024, 64), (8, 5, 1000, 64),
                                     (16, 3, 640, 128), (8, 1, 512, 64)])
def test_matches_oracle_random(B, K, V, E):
    t, w, b, scores, finished = _rand_case(B, K, V, E, seed=B + K + V)
    vf, idxf = fused_readout_topk(t, w, b, scores, finished, impl="pallas")
    vo, idxo = _oracle(t, w, b, scores, finished)
    # Continuous random data: index sets must agree; values to fp tolerance
    # (the kernel's online logsumexp sums lanes in a different order).
    np.testing.assert_array_equal(np.asarray(idxf), np.asarray(idxo))
    np.testing.assert_allclose(np.asarray(vf), np.asarray(vo),
                               rtol=1e-5, atol=1e-5)


def test_exact_on_integer_weights():
    """Small-integer t/w/b make every logit exactly representable, so the
    fused path must reproduce the oracle's VALUES bitwise (modulo lse, which
    both compute from the same exact logits)."""
    rng = np.random.RandomState(7)
    B, K, V, E = 8, 5, 768, 64
    t = jnp.asarray(rng.randint(-3, 4, (B * K, E)).astype(np.float32))
    w = jnp.asarray(rng.randint(-3, 4, (E, V)).astype(np.float32))
    b = jnp.asarray(rng.randint(-3, 4, V).astype(np.float32))
    scores = jnp.asarray(rng.randint(-5, 5, (B, K)).astype(np.float32))
    finished = jnp.asarray(rng.rand(B, K) < 0.3)
    vf, idxf = fused_readout_topk(t, w, b, scores, finished, impl="pallas")
    vo, idxo = _oracle(t, w, b, scores, finished)
    np.testing.assert_array_equal(np.asarray(idxf), np.asarray(idxo))
    np.testing.assert_allclose(np.asarray(vf), np.asarray(vo),
                               rtol=1e-6, atol=1e-6)


def test_all_finished_rows():
    t, w, b, scores, _ = _rand_case(8, 5, 640, 64, seed=3)
    finished = jnp.ones((8, 5), bool)
    vf, idxf = fused_readout_topk(t, w, b, scores, finished, impl="pallas")
    vo, idxo = _oracle(t, w, b, scores, finished)
    np.testing.assert_array_equal(np.asarray(idxf), np.asarray(idxo))
    np.testing.assert_allclose(np.asarray(vf), np.asarray(vo),
                               rtol=1e-5, atol=1e-5)


def test_no_finished_rows():
    t, w, b, scores, _ = _rand_case(8, 5, 640, 64, seed=4)
    finished = jnp.zeros((8, 5), bool)
    vf, idxf = fused_readout_topk(t, w, b, scores, finished, impl="pallas")
    vo, idxo = _oracle(t, w, b, scores, finished)
    np.testing.assert_array_equal(np.asarray(idxf), np.asarray(idxo))
    np.testing.assert_allclose(np.asarray(vf), np.asarray(vo),
                               rtol=1e-5, atol=1e-5)


def test_bfloat16_inputs():
    """Production dtype: bf16 t/w with fp32 accumulation. The oracle runs
    the identical dot, so indices must agree."""
    t, w, b, scores, finished = _rand_case(8, 5, 640, 64, seed=5)
    t = t.astype(jnp.bfloat16)
    w = w.astype(jnp.bfloat16)
    vf, idxf = fused_readout_topk(t, w, b, scores, finished, impl="pallas")
    vo, idxo = _oracle(t, w, b, scores, finished)
    np.testing.assert_array_equal(np.asarray(idxf), np.asarray(idxo))
    np.testing.assert_allclose(np.asarray(vf), np.asarray(vo),
                               rtol=1e-4, atol=1e-4)


def test_xla_impl_matches_unfused():
    t, w, b, scores, finished = _rand_case(8, 5, 640, 64, seed=6)
    vf, idxf = fused_readout_topk(t, w, b, scores, finished, impl="xla")
    vo, idxo = _oracle(t, w, b, scores, finished)
    np.testing.assert_array_equal(np.asarray(idxf), np.asarray(idxo))
    np.testing.assert_array_equal(np.asarray(vf), np.asarray(vo))


def test_lse_semantics():
    """The fused top-score for a live row equals scores + log-softmax prob
    of the argmax token (the definition, independent of the oracle path)."""
    t, w, b, scores, _ = _rand_case(4, 2, 512, 32, seed=8)
    finished = jnp.zeros((4, 2), bool)
    vf, idxf = fused_readout_topk(t, w, b, scores, finished, impl="pallas")
    logits = np.asarray(jnp.dot(t, w) + b).reshape(4, 2, 512)
    logp = logits - np.log(np.exp(
        logits - logits.max(-1, keepdims=True)).sum(-1, keepdims=True)) \
        - logits.max(-1, keepdims=True)
    cand = np.asarray(scores)[..., None] + logp
    best = cand.reshape(4, -1).max(-1)
    np.testing.assert_allclose(np.asarray(vf)[:, 0], best, rtol=1e-5,
                               atol=1e-5)


def test_shallow_slots_watermark_triggers_exact_fallback():
    """Construct logits where the top-5 of one row all share a LANE (vocab
    ids congruent mod 128): the 3-slot cascade alone would lose two of
    them, so the watermark must flag the row and the fallback must return
    the oracle answer anyway."""
    B, K, V, E = 4, 5, 640, 1
    t = jnp.ones((B * K, E), jnp.float32)
    w = np.zeros((E, V), np.float32)           # logits = w[0] + b
    b = np.linspace(-1.0, 0.0, V).astype(np.float32)
    # ids 7, 135, 263, 391, 519 all live in lane 7 — give them the top vals
    for rank, vid in enumerate([7, 135, 263, 391, 519]):
        b[vid] = 100.0 - rank
    w = jnp.asarray(w)
    b = jnp.asarray(b)
    scores = jnp.zeros((B, K), jnp.float32)
    finished = jnp.zeros((B, K), bool)
    vf, idxf = fused_readout_topk(t, w, b, scores, finished, impl="pallas",
                                  slots=3)
    vo, idxo = _oracle(t, w, b, scores, finished)
    np.testing.assert_array_equal(np.asarray(idxf), np.asarray(idxo))
    np.testing.assert_allclose(np.asarray(vf), np.asarray(vo),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("slots", [1, 2, 3, 4])
def test_shallow_slots_match_oracle_random(slots):
    t, w, b, scores, finished = _rand_case(8, 5, 1024, 64, seed=slots)
    vf, idxf = fused_readout_topk(t, w, b, scores, finished, impl="pallas",
                                  slots=slots)
    vo, idxo = _oracle(t, w, b, scores, finished)
    np.testing.assert_array_equal(np.asarray(idxf), np.asarray(idxo))
    np.testing.assert_allclose(np.asarray(vf), np.asarray(vo),
                               rtol=1e-5, atol=1e-5)


def test_frozen_rows_do_not_arm_the_watermark_fallback():
    """A watermark violation on a FROZEN row is harmless (its kernel
    outputs are replaced by the analytic frozen candidates), so it must
    not arm the exactness fallback: with every row finished the
    defer_exact flag is False even though the lane-collision construction
    fires every row's watermark; with live rows it fires. (Review finding:
    late-decode chunks are mostly frozen and bf16 ties fire constantly —
    spurious depth-K reruns cost real time at zero benefit.)"""
    B, K, V, E = 4, 5, 640, 1
    t = jnp.ones((B * K, E), jnp.float32)
    w = jnp.zeros((E, V), jnp.float32)
    b = np.linspace(-1.0, 0.0, V).astype(np.float32)
    for rank, vid in enumerate([7, 135, 263, 391, 519]):
        b[vid] = 100.0 - rank
    b = jnp.asarray(b)
    scores = jnp.zeros((B, K), jnp.float32)

    live = jnp.zeros((B, K), bool)
    *_, flag_live = fused_readout_topk(t, w, b, scores, live,
                                       impl="pallas", slots=3,
                                       defer_exact=True)
    assert bool(flag_live)

    frozen = jnp.ones((B, K), bool)
    out = fused_readout_topk(t, w, b, scores, frozen, impl="pallas",
                             slots=3, defer_exact=True)
    assert not bool(out[-1])
    # and the frozen results themselves match the oracle
    vo, idxo = _oracle(t, w, b, scores, frozen)
    np.testing.assert_array_equal(np.asarray(out[1]), np.asarray(idxo))
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(vo),
                               rtol=1e-5, atol=1e-5)


def _ban_oracle(t, w, b, scores, finished, ban, pad_id=0):
    from vag_nmt_tpu.ops.pallas_topk import _FLOOR

    logits = (jnp.dot(t, w, preferred_element_type=jnp.float32)
              + b.astype(jnp.float32))
    R = logits.shape[0]
    rows = jnp.arange(R, dtype=jnp.int32)[:, None]
    logits = logits.at[rows, ban].min(jnp.float32(_FLOOR))
    B, K = scores.shape
    return beam_topk(logits.reshape(B, K, -1), scores, finished,
                     pad_id=pad_id, impl="xla")


@pytest.mark.parametrize("slots", [0, 2])
def test_ban_mask_matches_oracle(slots):
    """The in-kernel dense ban mask (r4: no-repeat n-gram blocking no
    longer forces the unfused pipeline) must match the oracle that
    scatters the ban into materialized logits BEFORE beam_topk — the ban
    excludes the banned mass from the softmax normalization on both
    paths. Covers the sentinel (id == V, a dropped no-op), duplicate ids,
    full slot depth and the shallow-slots watermark regime."""
    rng = np.random.RandomState(11)
    B, K, V, E, M = 8, 5, 768, 64, 12
    t, w, b, scores, finished = _rand_case(B, K, V, E, seed=11)
    ban = rng.randint(0, V + 1, (B * K, M)).astype(np.int32)  # V = sentinel
    ban[:, -1] = ban[:, 0]                                    # duplicates
    ban = jnp.asarray(ban)
    vf, idxf = fused_readout_topk(t, w, b, scores, finished, ban,
                                  impl="pallas", slots=slots)
    vo, idxo = _ban_oracle(t, w, b, scores, finished, ban)
    np.testing.assert_array_equal(np.asarray(idxf), np.asarray(idxo))
    np.testing.assert_allclose(np.asarray(vf), np.asarray(vo),
                               rtol=1e-5, atol=1e-5)


def test_ban_none_is_noop():
    """ban=None must leave results identical to the no-ban signature (the
    mask input is only added to the kernel when a ban is present)."""
    t, w, b, scores, finished = _rand_case(8, 5, 640, 64, seed=3)
    v0, i0 = fused_readout_topk(t, w, b, scores, finished, impl="pallas")
    v1, i1 = fused_readout_topk(t, w, b, scores, finished, None,
                                impl="pallas")
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
