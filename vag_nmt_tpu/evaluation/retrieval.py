"""Image<->text retrieval R@K on the shared embedding space (SURVEY.md C18;
needed by the scaled preset / BASELINE config 5)."""

from __future__ import annotations

from typing import Dict

import numpy as np


def retrieval_recall(img_emb: np.ndarray, txt_emb: np.ndarray,
                     ks=(1, 5, 10)) -> Dict[str, float]:
    """img_emb/txt_emb: (N, D), row i is a matched pair. Returns R@K both
    directions + median rank (1-based)."""
    img = np.asarray(img_emb, np.float32)
    txt = np.asarray(txt_emb, np.float32)
    sim = txt @ img.T                     # (N, N): sentence x image
    n = sim.shape[0]
    out: Dict[str, float] = {}
    for name, s in (("t2i", sim), ("i2t", sim.T)):
        # rank of the true match for each row (0-based)
        order = np.argsort(-s, axis=1)
        ranks = np.empty(n, np.int64)
        for i in range(n):
            ranks[i] = int(np.where(order[i] == i)[0][0])
        for k in ks:
            out[f"{name}_r@{k}"] = float((ranks < k).mean())
        out[f"{name}_medr"] = float(np.median(ranks) + 1)
    return out
