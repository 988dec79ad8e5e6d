"""METEOR python approximation (SURVEY.md C14) and retrieval R@K (C18)."""

import numpy as np

from vag_nmt_tpu.evaluation.meteor import _align, _chunks, meteor_score
from vag_nmt_tpu.evaluation.retrieval import retrieval_recall


def test_meteor_perfect_match_near_one():
    hyps = ["ein mann geht die straße entlang", "der hund rennt"]
    s = meteor_score(hyps, hyps, jar=None)
    # perfect alignment: P=R=1, one chunk per sentence -> tiny penalty only
    assert 0.9 < s <= 1.0


def test_meteor_disjoint_is_zero():
    assert meteor_score(["a b c"], ["x y z"], jar=None) == 0.0


def test_meteor_orders_quality():
    ref = ["ein mann geht die straße entlang"]
    good = ["ein mann geht die straße"]
    bad = ["straße die geht mann"]
    assert meteor_score(good, ref, jar=None) > meteor_score(bad, ref, jar=None)


def test_align_exact_then_stem():
    # "straßen" stems to "straße" via the -n suffix rule
    m = _align("die straßen".split(), "die straße".split())
    assert (0, 0) in m and (1, 1) in m


def test_chunks_counts_contiguous_runs():
    assert _chunks([(0, 0), (1, 1), (2, 2)]) == 1
    assert _chunks([(0, 1), (1, 0)]) == 2
    assert _chunks([]) == 0


def test_retrieval_identity_embeddings_perfect():
    emb = np.eye(8, 16, dtype=np.float32)
    out = retrieval_recall(emb, emb, ks=(1, 5))
    assert out["t2i_r@1"] == 1.0 and out["i2t_r@1"] == 1.0
    assert out["t2i_medr"] == 1.0


def test_retrieval_shuffled_rows_rank_correctly():
    rng = np.random.RandomState(0)
    img = rng.randn(10, 32).astype(np.float32)
    img /= np.linalg.norm(img, axis=1, keepdims=True)
    # text embedding = image embedding + tiny noise -> R@1 should be high
    txt = img + 0.01 * rng.randn(10, 32).astype(np.float32)
    out = retrieval_recall(img, txt, ks=(1,))
    assert out["t2i_r@1"] == 1.0 and out["i2t_r@1"] == 1.0
