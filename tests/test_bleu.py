"""BLEU parity tests (SURVEY.md C13): corpus_bleu must reproduce
multi-bleu.perl values. Golden values below are hand-derivable from the
multi-bleu formula (modified n-gram precision, no smoothing, closest-ref BP)."""

import math

from vag_nmt_tpu.evaluation.bleu import corpus_bleu


def test_perfect_match_is_100():
    hyps = ["the cat sat on the mat", "a quick brown fox jumps high"]
    r = corpus_bleu(hyps, list(hyps))
    assert abs(r.bleu - 100.0) < 1e-9
    assert r.brevity_penalty == 1.0


def test_zero_ngram_gives_zero_no_smoothing():
    # 4-gram match count is 0 -> multi-bleu prints BLEU = 0.00
    r = corpus_bleu(["a b c d"], ["a b x d"])
    assert r.bleu == 0.0


def test_known_value_single_sentence():
    # hyp: "the the the the the the the" vs ref "the cat is on the mat"
    # p1 clipped = 2/7 (classic Papineni clipping example); p2..p4 = 0 -> BLEU 0
    r = corpus_bleu(["the the the the the the the"],
                    ["the cat is on the mat"])
    assert abs(r.precisions[0] - 2 / 7) < 1e-12
    assert r.bleu == 0.0


def test_known_value_full_computation():
    hyp = ["the cat sat on the mat"]          # 6 tokens
    ref = ["the cat is on the mat"]           # 6 tokens
    r = corpus_bleu(hyp, ref)
    # 1-grams: the,cat,sat,on,the,mat -> matched: the(2),cat,on,mat = 5/6
    # 2-grams: 5 total; matched: 'the cat','on the','the mat' = 3/5
    # 3-grams: 4 total; matched: 'on the mat' = 1/4
    # 4-grams: 3 total; matched: 0 -> BLEU = 0 under no smoothing
    assert abs(r.precisions[0] - 5 / 6) < 1e-12
    assert abs(r.precisions[1] - 3 / 5) < 1e-12
    assert abs(r.precisions[2] - 1 / 4) < 1e-12
    assert r.bleu == 0.0


def test_known_value_longer_corpus():
    hyps = ["the cat sat on the mat there it is",
            "a quick brown fox jumps over the lazy dog today"]
    refs = ["the cat sat on the mat here it is",
            "a quick brown fox jumps over the lazy dog now"]
    r = corpus_bleu(hyps, refs)
    # 19 hyp tokens, 19 ref tokens -> BP = 1
    assert r.brevity_penalty == 1.0
    # p1 = 17/19, p2 = 14/17, p3 = 11/15, p4 = 9/13 (hand-counted)
    expect = (17 / 19) * (14 / 17) * (11 / 15) * (9 / 13)
    assert abs(r.bleu - 100.0 * expect ** 0.25) < 1e-9


def test_brevity_penalty_short_hyp():
    r = corpus_bleu(["the cat sat"], ["the cat sat on the mat"])
    assert abs(r.brevity_penalty - math.exp(1 - 6 / 3)) < 1e-12


def test_multi_reference_clipping_and_closest_length():
    hyps = ["a b c"]
    refs = [["a b c d"], ["x y z"]]
    r = corpus_bleu(hyps, refs)
    # closest ref length: |4-3|=1 vs |3-3|=0 -> 3, BP=1
    assert r.ref_len == 3
    assert r.brevity_penalty == 1.0


def test_mismatched_lengths_raise():
    import pytest
    with pytest.raises(ValueError):
        corpus_bleu(["a"], ["a", "b"])


def test_empty_reference_list_raises():
    import pytest

    from vag_nmt_tpu.evaluation.bleu import corpus_bleu

    with pytest.raises(ValueError, match="line-count mismatch"):
        corpus_bleu(["a b c"], [])
