"""Offline corpus preprocessing (SURVEY.md C1, L0).

Replaces the reference's Moses+subword-nmt shell pipeline with pure Python:
tokenize + lowercase -> learn BPE on train -> apply BPE to all splits ->
build vocabs -> write artifacts:

    <out_dir>/<split>.<lang>     BPE'd text (space-separated units)
    <out_dir>/bpe.<lang>.json    merge table
    <out_dir>/vocab.<lang>.json  vocabulary

Feature .npy files are copied through untouched (they are opaque float
matrices, SURVEY.md C2)."""

from __future__ import annotations

import os
import shutil
from typing import List, Sequence

from vag_nmt_tpu.data.bpe import BPE, learn_bpe_from_lines
from vag_nmt_tpu.data.tokenizer import tokenize
from vag_nmt_tpu.data.vocab import Vocab


def preprocess_corpus(
    raw_dir: str,
    out_dir: str,
    splits: Sequence[str],
    langs: Sequence[str],
    *,
    bpe_merges: int = 10000,
    vocab_min_freq: int = 1,
    vocab_max_size: int = 0,
    lower: bool = True,
) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for lang in langs:
        # 1. tokenize all splits
        tokenized = {}
        for split in splits:
            path = os.path.join(raw_dir, f"{split}.{lang}")
            with open(path, encoding="utf-8") as f:
                tokenized[split] = [tokenize(ln.rstrip("\n"), lower=lower)
                                    for ln in f]
        # 2. learn BPE on train only
        merges = learn_bpe_from_lines(tokenized[splits[0]], bpe_merges)
        bpe = BPE(merges)
        bpe.save(os.path.join(out_dir, f"bpe.{lang}.json"))
        # 3. apply + write
        segmented: dict = {}
        for split in splits:
            # encode_line takes the C++ fast path when native/ is built
            segmented[split] = [bpe.encode_line(" ".join(toks))
                                for toks in tokenized[split]]
            with open(os.path.join(out_dir, f"{split}.{lang}"), "w",
                      encoding="utf-8") as f:
                for units in segmented[split]:
                    f.write(" ".join(units) + "\n")
        # 4. vocab from BPE'd train
        vocab = Vocab.build(segmented[splits[0]], min_freq=vocab_min_freq,
                            max_size=vocab_max_size)
        vocab.save(os.path.join(out_dir, f"vocab.{lang}.json"))

    # pass feature matrices through
    for split in splits:
        for suffix in (f"{split}_features.npy", f"{split}_features.npy.align.json"):
            src = os.path.join(raw_dir, suffix)
            if os.path.exists(src):
                shutil.copy(src, os.path.join(out_dir, suffix))


def preprocess_toy(data_dir: str, langs: Sequence[str] = ("en", "de"),
                   splits: Sequence[str] = ("train", "val", "test")) -> None:
    """The toy corpus is already space-tokenized symbol text; just build the
    vocab artifacts in place (no BPE) so the CLI pipeline runs end to end."""
    for lang in langs:
        with open(os.path.join(data_dir, f"train.{lang}"), encoding="utf-8") as f:
            lines = [ln.split() for ln in f]
        Vocab.build(lines).save(os.path.join(data_dir, f"vocab.{lang}.json"))


def postprocess_hypothesis(units: List[str]) -> str:
    """BPE units -> plain tokenized line (de-BPE; SURVEY.md §3.3)."""
    from vag_nmt_tpu.data.bpe import remove_bpe

    return " ".join(remove_bpe(units))
