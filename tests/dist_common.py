"""Shared deterministic batch builder for the two-process distributed smoke
test: both worker processes AND the single-process reference must construct
bit-identical global batches."""

import numpy as np


def make_global_batch(cfg, row_order, T=8, Tt=9, seed=123):
    """Deterministic (B, T) text-only batch whose row i is the fixed example
    `row_order[i]` — numpy only (callers wrap for their backend)."""
    m = cfg.model
    B = len(row_order)
    rng = np.random.RandomState(seed)
    n = max(row_order) + 1
    src = rng.randint(4, m.src_vocab_size, (n, T)).astype(np.int32)
    src_lens = rng.randint(2, T + 1, n)
    tgt = rng.randint(4, m.tgt_vocab_size, (n, Tt)).astype(np.int32)
    tgt_lens = rng.randint(2, Tt, n)

    src_mask = (np.arange(T)[None, :] < src_lens[:, None]).astype(np.float32)
    src = np.where(src_mask > 0, src, 0).astype(np.int32)
    tgt_in = np.zeros((n, Tt), np.int32)
    tgt_out = np.zeros((n, Tt), np.int32)
    tgt_in[:, 0] = 2
    for i in range(n):
        L = tgt_lens[i]
        tgt_in[i, 1:L] = tgt[i, : L - 1]
        tgt_out[i, : L - 1] = tgt[i, : L - 1]
        tgt_out[i, L - 1] = 3
    tgt_mask = (np.arange(Tt)[None, :] < tgt_lens[:, None]).astype(np.float32)

    order = np.asarray(row_order)
    return {
        "src": src[order],
        "src_mask": src_mask[order],
        "tgt_in": tgt_in[order],
        "tgt_out": tgt_out[order],
        "tgt_mask": tgt_mask[order],
    }
