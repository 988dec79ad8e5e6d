"""Offline preprocessing pipeline (SURVEY.md C1, L0): raw text -> BPE'd
splits + vocab/merge artifacts, and the IKEA dataset flow (BASELINE config 4
shape: train/val/test splits through the generic parallel reader)."""

import os

import numpy as np
import pytest

from vag_nmt_tpu.data.bpe import BPE
from vag_nmt_tpu.data.datasets import load_parallel_split, resolve_splits
from vag_nmt_tpu.data.pipeline import preprocess_corpus
from vag_nmt_tpu.data.vocab import Vocab

RAW_EN = [
    "Two young children are playing in the park .",
    "A man rides his bicycle down the busy street .",
    "The children play football in the park together .",
    "A woman reads a book on the quiet street corner .",
]
RAW_DE = [
    "Zwei kleine Kinder spielen im Park .",
    "Ein Mann fährt mit seinem Fahrrad die belebte Straße entlang .",
    "Die Kinder spielen zusammen Fußball im Park .",
    "Eine Frau liest ein Buch an der ruhigen Straßenecke .",
]


@pytest.fixture()
def raw_dir(tmp_path):
    d = tmp_path / "raw"
    d.mkdir()
    for split in ("train", "val", "test"):
        (d / f"{split}.en").write_text("\n".join(RAW_EN) + "\n")
        (d / f"{split}.de").write_text("\n".join(RAW_DE) + "\n")
    # aligned feature matrix passes through untouched
    np.save(d / "train_features.npy",
            np.random.RandomState(0).randn(4, 8).astype(np.float32))
    return str(d)


def test_preprocess_writes_artifacts_and_roundtrips(raw_dir, tmp_path):
    out = str(tmp_path / "out")
    preprocess_corpus(raw_dir, out, ["train", "val", "test"], ["en", "de"],
                      bpe_merges=50)
    for lang in ("en", "de"):
        assert os.path.exists(os.path.join(out, f"bpe.{lang}.json"))
        vocab = Vocab.load(os.path.join(out, f"vocab.{lang}.json"))
        assert len(vocab) > 4
        bpe = BPE.load(os.path.join(out, f"bpe.{lang}.json"))
        with open(os.path.join(out, f"train.{lang}"), encoding="utf-8") as f:
            lines = [ln.rstrip("\n") for ln in f]
        assert len(lines) == 4
        # every unit must be segmentable back: de-BPE restores the
        # lowercased tokenized words
        from vag_nmt_tpu.data.bpe import remove_bpe
        from vag_nmt_tpu.data.tokenizer import tokenize

        for raw, seg in zip(RAW_EN if lang == "en" else RAW_DE, lines):
            assert remove_bpe(seg.split()) == tokenize(raw)
        # applying the saved BPE to the raw tokenization reproduces the file
        for raw, seg in zip(RAW_EN if lang == "en" else RAW_DE, lines):
            assert bpe.encode_line(" ".join(tokenize(raw))) == seg.split()
    assert os.path.exists(os.path.join(out, "train_features.npy"))


def test_preprocess_truecase_flow(tmp_path):
    """--truecase path: Moses tokenization + learned truecaser artifacts;
    sentence-initial words with known non-initial casing get recased."""
    d = tmp_path / "raw"
    d.mkdir()
    en = ["The man sees the park .", "A dog runs in the park .",
          "Paris is far from the park .", "The man left Paris ."]
    de = ["Der Mann sieht den Park .", "Ein Hund läuft im Park .",
          "Paris ist weit vom Park entfernt .", "Der Mann verließ Paris ."]
    for split in ("train", "val", "test"):
        (d / f"{split}.en").write_text("\n".join(en) + "\n")
        (d / f"{split}.de").write_text("\n".join(de) + "\n")
    out = str(tmp_path / "out")
    preprocess_corpus(str(d), out, ["train", "val", "test"], ["en", "de"],
                      bpe_merges=40, truecase=True)
    from vag_nmt_tpu.data.bpe import remove_bpe
    from vag_nmt_tpu.data.moses import Truecaser

    assert os.path.exists(os.path.join(out, "truecase.en.json"))
    tc = Truecaser.load(os.path.join(out, "truecase.en.json"))
    assert tc.best["paris"] == "Paris"   # always-capitalized word learned
    with open(os.path.join(out, "train.en"), encoding="utf-8") as f:
        lines = [remove_bpe(ln.split()) for ln in f]
    # sentence-initial "The" recased to the learned lowercase form;
    # "Paris" keeps its capital even sentence-initially
    assert lines[0][0] == "the"
    assert lines[2][0] == "Paris"


def test_ikea_split_flow(raw_dir, tmp_path):
    """dataset='ikea' uses train/val/test naming through the same reader."""
    out = str(tmp_path / "out")
    preprocess_corpus(raw_dir, out, ["train", "val", "test"], ["en", "de"],
                      bpe_merges=30)
    train_split, dev_split, test_splits = resolve_splits("ikea")
    assert (train_split, dev_split, test_splits) == ("train", "val", ["test"])
    src_vocab = Vocab.load(os.path.join(out, "vocab.en.json"))
    tgt_vocab = Vocab.load(os.path.join(out, "vocab.de.json"))
    exs = load_parallel_split(out, "train", "en", "de", src_vocab, tgt_vocab)
    assert len(exs) == 4
    assert all(ex.tgt is not None and len(ex.src) > 0 for ex in exs)
