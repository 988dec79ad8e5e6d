"""Corpus translation: bucketed batches -> on-device decode -> text
(SURVEY.md §3.2 'translate' surface).

Keeps a small fixed set of batch shapes (one compile per bucket shape),
restores corpus order via the per-row index, de-BPEs hypotheses, and reports
throughput (sentences/sec) with a device fence."""

from __future__ import annotations

import time
from functools import lru_cache, partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np

from vag_nmt_tpu.core.config import Config
from vag_nmt_tpu.data.batching import BucketBatcher, Example
from vag_nmt_tpu.data.bpe import remove_bpe
from vag_nmt_tpu.data.prefetch import device_prefetch
from vag_nmt_tpu.data.vocab import Vocab
from vag_nmt_tpu.decode.beam import beam_search
from vag_nmt_tpu.decode.greedy import greedy_decode
from vag_nmt_tpu.models import prepare_decode


@lru_cache(maxsize=64)
def make_decode_fn(cfg: Config, beam_size: int, max_len: int):
    """One jitted program: encode + ground + init + full decode loop.

    Cached on (cfg, beam, max_len): jit compile caches live on the function
    object, so rebuilding this closure per translate_corpus call would
    recompile every bucket shape (~4.5s each on the tunneled TPU)."""

    @partial(jax.jit, static_argnames=())
    def decode(params, batch):
        state = prepare_decode(params, cfg.model, batch)
        if beam_size <= 1:
            toks, lens = greedy_decode(params, cfg.model, state, max_len)
            return toks, lens
        res = beam_search(params, cfg.model, state, beam_size=beam_size,
                          max_len=max_len,
                          length_norm_alpha=cfg.decode.length_norm_alpha)
        return res.best_tokens, res.best_lengths

    return decode


def translate_corpus(
    params,
    cfg: Config,
    examples: Sequence[Example],
    tgt_vocab: Vocab,
    *,
    beam_size: Optional[int] = None,
    max_len: Optional[int] = None,
    batch_size: Optional[int] = None,
    de_bpe: bool = True,
) -> Tuple[List[str], Dict[str, float]]:
    """Returns (hypothesis lines in corpus order, stats incl. sentences/sec)."""
    beam_size = beam_size if beam_size is not None else cfg.decode.beam_size
    max_len = max_len if max_len is not None else cfg.decode.max_len
    batch_size = (batch_size if batch_size is not None
                  else cfg.decode.decode_batch_size)

    batcher = BucketBatcher(
        examples, batch_size, cfg.data.length_buckets,
        include_image=cfg.model.multimodal, img_dim=cfg.model.img_feat_dim)
    decode = make_decode_fn(cfg, beam_size, max_len)

    n = len(examples)
    hyps: List[Optional[str]] = [None] * n
    t0 = time.perf_counter()
    n_done = 0
    # Keep device results in flight and fetch at the end: each device_get
    # pays a fixed round-trip latency, so per-batch synchronous gets would
    # serialize transfers with compute.
    pending = []
    for batch in device_prefetch(batcher.epoch(0, shuffle=False), size=2):
        feed = {k: v for k, v in batch.items() if k not in ("index",)}
        toks, lens = decode(params, feed)
        pending.append((toks, lens, batch["index"], batch["sample_mask"]))
    for toks, lens, index, smask in pending:
        toks, lens, index, smask = map(
            lambda x: np.asarray(jax.device_get(x)), (toks, lens, index, smask))
        for r in range(toks.shape[0]):
            if smask[r] == 0:
                continue
            units = tgt_vocab.decode(toks[r, : lens[r]])
            line = " ".join(remove_bpe(units) if de_bpe else units)
            hyps[int(index[r])] = line
            n_done += 1
    elapsed = time.perf_counter() - t0
    assert n_done == n, f"decoded {n_done} of {n} sentences"
    stats = {"sentences_per_sec": n / max(elapsed, 1e-9), "elapsed_s": elapsed,
             "sentences": n, "beam_size": beam_size}
    return [h if h is not None else "" for h in hyps], stats
