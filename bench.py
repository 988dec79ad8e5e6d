"""Headline benchmark: beam-5 batched decode throughput (sentences/sec/chip)
on the flagship VAG-NMT EN→DE config, Multi30k-like shapes (BASELINE.json
north-star: ≥5,000 sent/s/chip at beam=5).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "sent/s/chip", "vs_baseline": N}
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_SENT_PER_SEC = 5000.0  # BASELINE.json target for beam=5 on v5e


def main() -> None:
    import jax

    from vag_nmt_tpu.core.config import preset
    from vag_nmt_tpu.data.batching import Example
    from vag_nmt_tpu.data.vocab import Vocab
    from vag_nmt_tpu.decode.translate import translate_corpus
    from vag_nmt_tpu.models import init_params

    cfg = preset("m30k_ende_vag")
    # Multi30k-like statistics: ~13 BPE units mean source length, 10k vocab.
    cfg = cfg.replace(decode=dict(beam_size=5, max_len=64,
                                  decode_batch_size=256))
    m = cfg.model
    params = init_params(jax.random.key(0), m)

    rng = np.random.RandomState(0)
    n_sent = 4096
    examples = []
    for i in range(n_sent):
        L = int(np.clip(rng.normal(13, 4), 4, 32))
        examples.append(Example(
            src=list(rng.randint(4, m.src_vocab_size, L)),
            img=rng.randn(m.img_feat_dim).astype(np.float32),
            index=i,
        ))
    vocab = Vocab(["<pad>", "<unk>", "<sos>", "<eos>"]
                  + [f"t{i}" for i in range(m.tgt_vocab_size - 4)])

    # Warmup (compile every bucket shape), then timed run.
    translate_corpus(params, cfg, examples, vocab)
    t0 = time.perf_counter()
    _, stats = translate_corpus(params, cfg, examples, vocab)
    elapsed = time.perf_counter() - t0

    value = n_sent / elapsed
    print(json.dumps({
        "metric": "multi30k_ende_beam5_decode_throughput",
        "value": round(value, 1),
        "unit": "sent/s/chip",
        "vs_baseline": round(value / BASELINE_SENT_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
