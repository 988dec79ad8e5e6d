"""Online-serving latency of the decode path on the REAL chip.

The headline bench measures offline corpus THROUGHPUT (4096 sentences,
one fused dispatch). A serving deployment (decode/serve.Translator) cares
about per-request LATENCY at small batch: one dispatch per request, chunk
shape = the serving batch. This measures end-to-end request latency
(host batch assembly + upload + fused decode + fetch + detokenize) per
batch size on the bench-protocol checkpoint, reporting p50/p90/p99 over
`--calls` requests after a warmup.

The fused program is compiled per (chunk rows, bucketed t_src) shape, so
a request whose longest source lands in a not-yet-seen bucket pays that
bucket's compile. By default every bucket shape is pre-warmed (what
`decode.serve.Translator.warmup` does at startup), so the percentiles are
steady-state serving numbers; `--cold` skips the pre-warm to measure the
unwarmed deployment instead (measured: p99 ~2 s vs ~29 ms p50 at batch 8
— the compile events land in the tail).

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
    ap.add_argument("--cold", action="store_true",
                    help="skip the per-bucket pre-warm (measures an "
                         "unwarmed deployment; compiles land in the tail)")
    args = ap.parse_args()

    from benchmarks.bench_setup import protocol_setup
    from vag_nmt_tpu.data.batching import Example
    from vag_nmt_tpu.decode.translate import translate_corpus

    cfg, params, examples, vocab, _, _ = protocol_setup()

    out = {}
    for bs in [int(x) for x in args.batch_sizes.split(",")]:
        if not args.cold:
            # Translator.warmup equivalent at this serving batch size: one
            # dummy request per source-length bucket compiles every shape.
            img = (np.zeros((cfg.model.img_feat_dim,), np.float32)
                   if cfg.model.multimodal else None)
            for b in cfg.data.length_buckets:
                translate_corpus(params, cfg,
                                 [Example(src=[1] * b, img=img, index=0)],
                                 vocab, batch_size=bs)
            print(f"# batch {bs}: {len(cfg.data.length_buckets)} bucket "
                  f"shapes warmed", flush=True)
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
        # Rare ~2 s tunnel stalls (measured 3/200 calls, uncorrelated with
        # request shape or loop steps — every affected bucket was already
        # warmed and compiled) dominate raw p99 on this link. Report them
        # as a separate count + a stall-excluded p99 so the code's tail is
        # visible under the infra's.
        stall_cut = 10 * float(lat_ms[len(lat_ms) // 2])
        stalls = lat_ms[lat_ms > stall_cut]
        clean = lat_ms[lat_ms <= stall_cut]
        q = lambda a, p: float(a[min(len(a) - 1,
                                     int(round(p * (len(a) - 1))))])
        out[f"batch{bs}"] = {
            "p50_ms": round(q(lat_ms, 0.50), 1),
            "p90_ms": round(q(lat_ms, 0.90), 1),
            "p99_ms": round(q(lat_ms, 0.99), 1),
            "p99_ms_excl_stalls": round(q(clean, 0.99), 1),
            "n_stalls_over_10x_p50": int(stalls.size),
            "stall_ms": [round(float(s), 1) for s in stalls],
            "sent_per_s_at_p50": round(bs / (q(lat_ms, 0.50) / 1e3), 1),
        }
        print(f"# batch {bs}: p50 {out[f'batch{bs}']['p50_ms']} ms  "
              f"p99 {out[f'batch{bs}']['p99_ms']} ms", flush=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
