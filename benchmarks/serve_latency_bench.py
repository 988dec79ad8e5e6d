"""Online-serving latency of the decode path on the REAL chip.

The headline bench measures offline corpus THROUGHPUT (4096 sentences,
one fused dispatch). A serving deployment (decode/serve.Translator) cares
about per-request LATENCY at small batch: one dispatch per request, chunk
shape = the serving batch. This measures end-to-end request latency
(host batch assembly + upload + fused decode + fetch + detokenize) per
batch size on the bench-protocol checkpoint, reporting p50/p90/p99 over
`--calls` requests after a warmup.

Each batch size compiles its own fixed-shape program once (persistent
cache carries it across runs); the warmup call is excluded.

Run ON TPU:  python benchmarks/serve_latency_bench.py [--calls 100]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--calls", type=int, default=100)
    ap.add_argument("--batch-sizes", default="1,8,32")
    args = ap.parse_args()

    from benchmarks.bench_setup import protocol_setup
    from vag_nmt_tpu.decode.translate import translate_corpus

    cfg, params, examples, vocab, _, _ = protocol_setup()

    out = {}
    for bs in [int(x) for x in args.batch_sizes.split(",")]:
        # Requests sample the corpus round-robin so lengths vary per call
        # like real traffic (no per-call img_table: a serving request
        # uploads its own features). Indices wrap so every request is a
        # full batch even past the corpus end.
        reqs = [[examples[(i * bs + j) % len(examples)] for j in range(bs)]
                for i in range(args.calls + 1)]
        lat = []
        for i, req in enumerate(reqs):
            t0 = time.perf_counter()
            hyps, _ = translate_corpus(params, cfg, req, vocab,
                                       batch_size=bs)
            dt = time.perf_counter() - t0
            if i:                         # first call is compile/warmup
                lat.append(dt)
        lat_ms = np.sort(np.array(lat) * 1e3)
        q = lambda p: float(lat_ms[min(len(lat_ms) - 1,
                                       int(round(p * (len(lat_ms) - 1))))])
        out[f"batch{bs}"] = {
            "p50_ms": round(q(0.50), 1),
            "p90_ms": round(q(0.90), 1),
            "p99_ms": round(q(0.99), 1),
            "sent_per_s_at_p50": round(bs / (q(0.50) / 1e3), 1),
        }
        print(f"# batch {bs}: p50 {out[f'batch{bs}']['p50_ms']} ms  "
              f"p99 {out[f'batch{bs}']['p99_ms']} ms", flush=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
