"""Precomputed image-feature loading (SURVEY.md C2, §3.4).

The reference extracts ResNet-50 pool5 features offline and relies on the
feature matrix's ROW ORDER silently matching the corpus line order — a
silent-corruption hazard called out in SURVEY.md §3.4. The loader here
verifies alignment explicitly: row count must equal corpus line count, and an
optional sidecar checksum file (written at extraction time) is compared
against the corpus."""

from __future__ import annotations

import hashlib
import json
import os
from typing import Optional

import numpy as np


def corpus_checksum(lines) -> str:
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode("utf-8"))
        h.update(b"\n")
    return h.hexdigest()


def save_features(path: str, feats: np.ndarray,
                  corpus_lines: Optional[list] = None) -> None:
    np.save(path, feats)
    # np.save appends ".npy" when absent; the sidecar must sit next to the
    # file ACTUALLY written, or load_features("...npy") would never find it
    # and silently skip the checksum (review finding)
    if not path.endswith(".npy"):
        path = path + ".npy"
    if corpus_lines is not None:
        with open(path + ".align.json", "w") as f:
            json.dump({"rows": int(feats.shape[0]),
                       "corpus_sha256": corpus_checksum(corpus_lines)}, f)


def load_features(path: str, expected_rows: Optional[int] = None,
                  corpus_lines: Optional[list] = None) -> np.ndarray:
    feats = np.load(path, mmap_mode="r")
    if expected_rows is not None and feats.shape[0] != expected_rows:
        raise ValueError(
            f"feature matrix {path} has {feats.shape[0]} rows, corpus has "
            f"{expected_rows} lines — misaligned features silently corrupt "
            f"grounding; re-extract.")
    sidecar = path + ".align.json"
    if corpus_lines is not None and os.path.exists(sidecar):
        with open(sidecar) as f:
            meta = json.load(f)
        got = corpus_checksum(corpus_lines)
        if meta.get("corpus_sha256") not in (None, got):
            raise ValueError(
                f"feature alignment checksum mismatch for {path}: features "
                f"were extracted against a different corpus ordering.")
    return feats
