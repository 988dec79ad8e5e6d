"""Offline corpus preprocessing (SURVEY.md C1, L0).

Replaces the reference's Moses+subword-nmt shell pipeline
(tokenize -> truecase/lowercase -> learn BPE on train -> apply BPE -> vocab)
with pure Python:

    <out_dir>/<split>.<lang>        BPE'd text (space-separated units)
    <out_dir>/bpe.<lang>.json       merge table
    <out_dir>/vocab.<lang>.json     vocabulary
    <out_dir>/truecase.<lang>.json  truecase model (when truecase=True)

Tokenization is Moses-parity by default (data/moses.py, rule-for-rule
tokenizer.perl); ``tokenizer="simple"`` selects the round-1 regex tokenizer.
Casing follows the reference's two documented options: ``lower=True``
(Multi30k convention) or ``truecase=True`` (train a truecaser on the train
split, apply to all splits — Moses train-truecaser.perl/truecase.perl).

Feature .npy files are copied through untouched (opaque float matrices,
SURVEY.md C2)."""

from __future__ import annotations

import json
import os
import shutil
from typing import List, Sequence

from vag_nmt_tpu.data.bpe import BPE, learn_bpe_from_lines
from vag_nmt_tpu.data.moses import MosesTokenizer, Truecaser
from vag_nmt_tpu.data.tokenizer import tokenize as simple_tokenize
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
    truecase: bool = False,
    tokenizer: str = "moses",
) -> None:
    if truecase and lower:
        lower = False  # truecasing subsumes lowercasing
    os.makedirs(out_dir, exist_ok=True)
    # Manifest lets downstream consumers (decode/serve.py) apply the SAME
    # host preprocessing to raw input that training data went through —
    # mismatched tokenization/casing silently degrades translation quality.
    with open(os.path.join(out_dir, "preprocess.json"), "w") as f:
        json.dump({"tokenizer": tokenizer, "lower": lower,
                   "truecase": truecase, "langs": list(langs),
                   "bpe_merges": bpe_merges}, f)
    for lang in langs:
        mt = MosesTokenizer(lang) if tokenizer == "moses" else None

        def tok_line(ln: str) -> List[str]:
            if mt is not None:
                toks = mt.tokenize(ln)
                return [t.lower() for t in toks] if lower else toks
            return simple_tokenize(ln, lower=lower)

        # 1. tokenize all splits
        tokenized = {}
        for split in splits:
            path = os.path.join(raw_dir, f"{split}.{lang}")
            with open(path, encoding="utf-8") as f:
                tokenized[split] = [tok_line(ln.rstrip("\n")) for ln in f]
        # 2. (optional) truecase: train on the train split, apply everywhere
        if truecase:
            tc = Truecaser.train(tokenized[splits[0]])
            tc.save(os.path.join(out_dir, f"truecase.{lang}.json"))
            for split in splits:
                tokenized[split] = [tc.truecase(toks)
                                    for toks in tokenized[split]]
        # 3. learn BPE on train only
        merges = learn_bpe_from_lines(tokenized[splits[0]], bpe_merges)
        bpe = BPE(merges)
        bpe.save(os.path.join(out_dir, f"bpe.{lang}.json"))
        # 4. apply + write
        segmented: dict = {}
        for split in splits:
            # encode_line takes the C++ fast path when native/ is built
            segmented[split] = [bpe.encode_line(" ".join(toks))
                                for toks in tokenized[split]]
            with open(os.path.join(out_dir, f"{split}.{lang}"), "w",
                      encoding="utf-8") as f:
                for units in segmented[split]:
                    f.write(" ".join(units) + "\n")
        # 5. vocab from BPE'd train
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
