"""METEOR-1.5 Python scorer (SURVEY.md C14) and retrieval R@K (C18).

The METEOR expectations below are HAND-WORKED from the METEOR-1.5 formula
(per-language alpha/beta/gamma/delta + module weights + content/function
discounting + fragmentation penalty), so they pin the implementation to the
published algorithm, not to itself.
"""

import numpy as np
import pytest

from vag_nmt_tpu.evaluation.meteor import (
    LANG_PARAMS,
    MeteorScorer,
    MeteorStats,
    meteor_score,
    score_from_stats,
)


def test_meteor_identical_corpus_scores_one():
    hyps = ["a man rides a horse", "the dog runs", "two kids play football"]
    assert meteor_score(hyps, hyps, lang="en", jar=None) == 1.0
    assert meteor_score(hyps, hyps, lang="de", jar=None) == 1.0


def test_meteor_disjoint_is_zero():
    assert meteor_score(["a b c"], ["x y z"], lang="en", jar=None) == 0.0


def test_meteor_hand_worked_english_exact():
    """hyp 'the cat sat' vs ref 'the cat jumped' (en):
    matches: the(function), cat(content) — one chunk, 2 of 3 words.
    P = R = (0.75*1 + 0.25*1) / (0.75*2 + 0.25*1) = 1/1.75
    Fmean = P (P == R), frag = 1/2, pen = 0.6 * 0.5**0.2."""
    s = MeteorScorer("en").sentence_score("the cat sat", "the cat jumped")
    p = 1 / 1.75
    expect = p * (1 - 0.6 * 0.5 ** 0.2)
    assert abs(s - expect) < 1e-9, (s, expect)


def test_meteor_hand_worked_english_stem_weight():
    """hyp 'dogs run' vs ref 'dog runs' (en): both matches via the Snowball
    stem module (weight 0.6), both content words, single chunk covering
    everything (no fragmentation penalty).
    P = R = 0.6*(0.75*2) / (0.75*2) = 0.6; Fmean = 0.6."""
    s = MeteorScorer("en").sentence_score("dogs run", "dog runs")
    assert abs(s - 0.6) < 1e-9, s


def test_meteor_hand_worked_german():
    """hyp 'der Hund läuft' vs ref 'der Hund lief' (de):
    exact matches der(function) + hund(content); δ=0.55, γ=0.55, β=1.0.
    P = R = (0.55 + 0.45)/(0.55*2 + 0.45) = 1/1.55; pen = 0.55*0.5."""
    s = MeteorScorer("de").sentence_score("der Hund läuft", "der Hund lief")
    p = 1 / 1.55
    expect = p * (1 - 0.55 * 0.5)
    assert abs(s - expect) < 1e-9, (s, expect)


def test_meteor_aligner_minimizes_chunks():
    """hyp 'a b' vs ref 'a x a b': matching a->ref[2] gives ONE chunk
    (a,b adjacent in both); the greedy first-occurrence choice a->ref[0]
    would give two. The beam aligner must find the 1-chunk alignment."""
    st = MeteorScorer("en").sentence_stats("a b", "a x a b")
    assert st.matches_h == 2
    assert st.chunks == 1


def test_meteor_content_match_outweighs_function_match():
    """δ=0.75 (en) weights content-word matches above function words."""
    sc = MeteorScorer("en")
    only_function = sc.sentence_score("the house", "the garden")
    only_content = sc.sentence_score("big house", "nice house")
    assert only_content > only_function


def test_meteor_corpus_aggregates_stats_not_scores():
    """Corpus score = formula on SUMMED sufficient statistics (the jar's
    aggregation), which differs from averaging sentence scores."""
    sc = MeteorScorer("en")
    hyps = ["the cat sat on the mat", "completely unrelated words here"]
    refs = ["the cat sat on the mat", "a man rides a small horse"]
    corpus = sc.corpus_score(hyps, refs)
    mean = np.mean([sc.sentence_score(h, r) for h, r in zip(hyps, refs)])
    assert corpus > 0
    total = MeteorStats()
    for h, r in zip(hyps, refs):
        total.add(sc.sentence_stats(h, r))
    assert corpus == score_from_stats(total, sc.params)
    assert abs(corpus - mean) > 1e-3


def test_meteor_orders_quality():
    ref = ["a man rides a horse", "the dog runs fast"]
    good = ["a man rides a horse", "the dog runs quickly"]
    bad = ["horse horse horse", "cat sleeps"]
    assert (meteor_score(good, ref, lang="en", jar=None)
            > meteor_score(bad, ref, lang="en", jar=None))


def test_meteor_normalization_case_and_punct():
    sc = MeteorScorer("en")
    assert sc.sentence_score("The cat.", "the cat .") == 1.0


def test_meteor_french_stemmer_active():
    """'mangeait'/'mangeaient' share a French Snowball stem; with w_stem=0.2
    the match contributes but scores below an exact match."""
    sc = MeteorScorer("fr")
    stem = sc.sentence_score("il mangeait", "il mangeaient")
    exact = sc.sentence_score("il mangeait", "il mangeait")
    assert 0 < stem < exact == 1.0


def test_meteor_length_mismatch_raises():
    with pytest.raises(ValueError):
        MeteorScorer("en").corpus_score(["a"], ["a", "b"])


def test_meteor_params_cover_reference_languages():
    for lang in ("en", "de", "fr", "other"):
        p = LANG_PARAMS[lang]
        assert 0 < p.alpha < 1 and p.weights[0] == 1.0


# ---------------------------------------------------------------------------
# retrieval R@K (unchanged from round 1)

def test_retrieval_identity_embeddings_perfect():
    from vag_nmt_tpu.evaluation.retrieval import retrieval_recall

    emb = np.eye(8, 16, dtype=np.float32)
    out = retrieval_recall(emb, emb, ks=(1, 5))
    assert out["t2i_r@1"] == 1.0 and out["i2t_r@1"] == 1.0
    assert out["t2i_medr"] == 1.0


def test_retrieval_shuffled_rows_rank_correctly():
    from vag_nmt_tpu.evaluation.retrieval import retrieval_recall

    rng = np.random.RandomState(0)
    img = rng.randn(10, 32).astype(np.float32)
    img /= np.linalg.norm(img, axis=1, keepdims=True)
    txt = img + 0.01 * rng.randn(10, 32).astype(np.float32)
    out = retrieval_recall(img, txt, ks=(1,))
    assert out["t2i_r@1"] == 1.0 and out["i2t_r@1"] == 1.0


def test_meteor_paraphrase_table_changes_alignment(tmp_path):
    """A hand-built METEOR-format ``|||`` table through load_paraphrases:
    the paraphrase module must align 'cat' <-> 'feline' (weight 0.6 for en,
    counted at delta-discounted content weight), raising the score vs the
    same pair without a table; a multiword phrase entry must align too."""
    from vag_nmt_tpu.evaluation.meteor import MeteorScorer, load_paraphrases

    table = tmp_path / "paraphrase.txt"
    table.write_text(
        "cat ||| feline\n"
        "did not ||| failed to\n"
        "malformed line without separator\n"
        " ||| empty-left\n")
    loaded = load_paraphrases(str(table))
    assert loaded[("cat",)] == {("feline",)}
    assert ("failed", "to") in loaded[("did", "not")]
    # symmetric closure
    assert ("cat",) in loaded[("feline",)]

    hyp = ["the cat sat"]
    ref = ["the feline sat"]
    base = MeteorScorer("en").corpus_score(hyp, ref)
    para = MeteorScorer("en", paraphrase_file=str(table)).corpus_score(
        hyp, ref)
    assert para > base

    hyp2 = ["they did not arrive"]
    ref2 = ["they failed to arrive"]
    base2 = MeteorScorer("en").corpus_score(hyp2, ref2)
    para2 = MeteorScorer("en", paraphrase_file=str(table)).corpus_score(
        hyp2, ref2)
    assert para2 > base2
    s = MeteorScorer("en", paraphrase_file=str(table))
    assert s.active_modules["paraphrase"]


def test_meteor_active_modules_surface():
    """VERDICT r2 weak #6: an unsupported language must SAY it lost its
    stemmer and function words rather than silently degrade."""
    from vag_nmt_tpu.evaluation.meteor import MeteorScorer

    s_en = MeteorScorer("en")
    assert s_en.active_modules["stem"]
    assert s_en.active_modules["function_words"]
    s_xx = MeteorScorer("cs")      # unsupported -> 'other' params
    assert not s_xx.active_modules["stem"]
    assert not s_xx.active_modules["function_words"]
    assert s_xx.lang == "other"


import os as _os
import shutil as _shutil

_jar = _os.environ.get("METEOR_JAR", "")


@pytest.mark.skipif(
    not (_jar and _os.path.exists(_jar) and _shutil.which("java")),
    reason="METEOR jar oracle needs java + METEOR_JAR pointing at the jar "
           "(arms itself automatically once both exist)")
def test_meteor_python_matches_jar_oracle():
    """±0.1 parity gate vs the actual METEOR-1.5 jar (SURVEY.md C14 'single
    riskiest parity item'). Auto-skips without java/jar; the day a jar is
    present this becomes the binding check."""
    from vag_nmt_tpu.evaluation.meteor import MeteorScorer, _meteor_jar

    hyps = ["a man rides a bicycle on the street",
            "two dogs play in the park",
            "the quick brown fox jumped over the lazy dog"]
    refs = ["a man is riding a bike down the road",
            "two dogs are playing at a park",
            "a quick brown fox jumps over a lazy dog"]
    jar_score = _meteor_jar(hyps, refs, "en", _jar)
    py_score = MeteorScorer("en").corpus_score(hyps, refs)
    assert abs(jar_score - py_score) < 0.1
