"""Fused beam top-k kernel vs the lax.top_k reference (ops/pallas_topk.py).

CPU runs the Pallas interpreter — same kernel code as the TPU Mosaic compile.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vag_nmt_tpu.ops.pallas_topk import beam_topk


def _mk(B, K, V, seed=0, finished_frac=0.0):
    rng = np.random.RandomState(seed)
    logits = jnp.asarray(rng.randn(B, K, V).astype(np.float32) * 3.0)
    scores = jnp.asarray(rng.randn(B, K).astype(np.float32))
    finished = jnp.asarray(rng.rand(B, K) < finished_frac)
    return logits, scores, finished


@pytest.mark.parametrize("impl", ["pallas", "pallas_rows", "pallas_lanes"])
@pytest.mark.parametrize("B,K,V,ff", [
    (8, 5, 1000, 0.0),
    (8, 5, 1000, 0.4),     # mixed finished rows
    (16, 5, 1303, 0.2),    # V not a multiple of the vocab block
    (4, 3, 512, 1.0),      # everything finished
    (2, 1, 700, 0.0),      # K=1 (greedy-equivalent)
])
def test_pallas_matches_xla_reference(B, K, V, ff, impl):
    logits, scores, finished = _mk(B, K, V, seed=B + V, finished_frac=ff)
    v_ref, i_ref = beam_topk(logits, scores, finished, impl="xla")
    v_pal, i_pal = beam_topk(logits, scores, finished, impl=impl)
    np.testing.assert_allclose(np.asarray(v_pal), np.asarray(v_ref),
                               rtol=0, atol=0)
    # indices must agree exactly away from value ties; on ties accept any
    # index achieving the tied value
    v_ref_n, i_ref_n = np.asarray(v_ref), np.asarray(i_ref)
    i_pal_n = np.asarray(i_pal)
    flat = np.asarray(
        beam_topk(logits, scores, finished, impl="xla")[0])  # noqa: F841
    for b in range(B):
        for k in range(K):
            if i_pal_n[b, k] != i_ref_n[b, k]:
                # tie: both indices must map to the same candidate value
                assert (v_ref_n[b] == v_ref_n[b, k]).sum() > 1, (
                    b, k, i_pal_n[b, k], i_ref_n[b, k])


def test_flat_index_decomposes_to_beam_and_token():
    B, K, V = 4, 5, 640
    logits, scores, finished = _mk(B, K, V, seed=1)
    v, idx = beam_topk(logits, scores, finished, impl="pallas")
    idx = np.asarray(idx)
    beam, tok = idx // V, idx % V
    assert (beam >= 0).all() and (beam < K).all()
    assert (tok >= 0).all() and (tok < V).all()
    # values descending
    assert (np.diff(np.asarray(v), axis=1) <= 1e-7).all()


def test_finished_rows_freeze_on_pad():
    """A finished beam's only viable candidate is <pad> at its frozen score."""
    B, K, V = 2, 3, 256
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(B, K, V).astype(np.float32))
    scores = jnp.asarray(np.array([[5.0, -1e9, -1e9],
                                   [2.0, 1.0, -1e9]], np.float32))
    finished = jnp.asarray(np.array([[True, False, False],
                                     [True, True, False]]))
    v, idx = beam_topk(logits, scores, finished, impl="pallas")
    v, idx = np.asarray(v), np.asarray(idx)
    # best candidate of sentence 0 = frozen beam 0 at pad (flat idx 0*V+0)
    assert idx[0, 0] == 0 and abs(v[0, 0] - 5.0) < 1e-6
    # sentence 1: frozen beams 0 and 1 at pad outrank everything at 2.0, 1.0
    assert v[1, 0] == pytest.approx(2.0) and idx[1, 0] == 0
    assert v[1, 1] == pytest.approx(1.0) and idx[1, 1] == 1 * V + 0
