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

Arrival-process mode (--arrival; VERDICT r4 item 4): an online serving
simulation through decode/serve.Translator — Poisson arrivals of single
sentences with UNSORTED Multi30k lengths, a dynamic-batching server that
drains its queue in chunk-quantized batches (a fixed working-set cap of
--pool-chunks decode chunks), and an A/B of the two multi-chunk decode
architectures the Translator offers:

  chunked   — the host chunk loop: one dispatch per batch_size chunk,
              each chunk pays its own slowest row to max over the chunk.
  streaming — translate(streaming=True): ONE dispatch per drain; a
              batch_size-row working set refills from the drained pool as
              rows finish (beam_search_streaming's design regime —
              unsorted lengths make chunk service times heterogeneous).

Both modes replay the SAME seeded arrival trace. Reported per rate:
completed sent/s, mean drain size, and p50/p99 sentence latency
(completion - arrival, which includes queueing delay).

Run ON TPU:  python benchmarks/serve_latency_bench.py --arrival \
                 [--rates 500,1000,2000] [--n-req 2000] [--batch 32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _make_translator(cfg, params, vocab):
    """A real decode/serve.Translator over the bench-protocol checkpoint:
    src text is the synthetic vocab's own surface forms ("t7 t123 ..."),
    so the full serve path (tokenize -> vocab encode -> decode -> detok)
    runs exactly as deployed."""
    from vag_nmt_tpu.decode.serve import Translator

    return Translator(cfg, params, src_bpe=None, src_vocab=vocab,
                      tgt_vocab=vocab, lower=True, tokenizer="simple")


def _example_line(vocab, ex):
    return " ".join(vocab.itos[t] for t in ex.src)


def arrival_main(args):
    from benchmarks.bench_setup import protocol_setup

    cfg, params, examples, vocab, _, _ = protocol_setup()
    bs = args.batch
    pool_q = args.pool_chunks
    tr = _make_translator(cfg, params, vocab)

    # Pre-render request text + features once (host prep outside the loop;
    # per-request encode still happens inside translate(), as deployed).
    lines = [_example_line(vocab, ex) for ex in examples]
    feats = np.stack([ex.img for ex in examples])

    # Warm every shape the server can hit. Arrival lengths are <= 32 BPE
    # units (protocol corpus), so only buckets <= 32 are reachable; pooled
    # drains have >= bs rows, whose max length lands in the top two
    # buckets (24/32) with overwhelming probability — warming the full
    # bucket x pool cross product would pay ~35 cold compiles for shapes
    # the arrival process cannot produce.
    from vag_nmt_tpu.data.batching import Example

    from vag_nmt_tpu.data.batching import _bucket_for

    qs = sorted({q for q in (1, 2, 4, pool_q) if 1 <= q <= pool_q})
    # the reachable buckets are those up to the bucket COVERING the
    # longest arrival (a 31-unit request lands in bucket 32)
    top = _bucket_for(max(len(ex.src) for ex in examples),
                      cfg.data.length_buckets)
    buckets = [b for b in cfg.data.length_buckets if b <= top]
    img0 = np.zeros((cfg.model.img_feat_dim,), np.float32)
    t0 = time.perf_counter()
    from vag_nmt_tpu.decode.translate import translate_corpus
    for b in buckets:
        translate_corpus(params, cfg,
                         [Example(src=[1] * b, img=img0, index=0)],
                         vocab, batch_size=bs)
    scfg = tr._streaming_cfg()
    for b in buckets[-2:]:
        for q in qs:
            exs = [Example(src=[1] * b, img=img0, index=i)
                   for i in range(q * bs)]
            translate_corpus(params, scfg, exs, vocab, batch_size=bs)
    print(f"# warmup ({len(buckets)} chunk buckets + 2x{len(qs)} pool "
          f"shapes): {time.perf_counter() - t0:.1f}s", flush=True)

    def run_mode(streaming: bool, rate: float, n_req: int, seed: int):
        rng = np.random.RandomState(seed)
        arrive = np.cumsum(rng.exponential(1.0 / rate, n_req))
        order = rng.permutation(len(examples))[:n_req]  # unsorted lengths
        done = np.zeros(n_req)
        t_start = time.perf_counter()
        i = 0
        while i < n_req:
            now = time.perf_counter() - t_start
            if arrive[i] > now:
                time.sleep(min(arrive[i] - now, 0.05))
                continue
            # Drain: all arrived-but-unserved requests, quantized DOWN to a
            # warmed drain size (multiples of bs in {1,2,4,pool_q} chunks,
            # or a single partial chunk) so no live request ever compiles.
            n_wait = int(np.searchsorted(arrive, now, side="right")) - i
            if n_wait >= bs:
                q = max(x for x in qs if x * bs <= n_wait) \
                    if n_wait < pool_q * bs else pool_q
                take = q * bs
            else:
                take = n_wait
            idx = order[i:i + take]
            tr.translate([lines[j] for j in idx],
                         images=feats[idx], batch_size=bs,
                         streaming=streaming)
            done[i:i + take] = time.perf_counter() - t_start
            i += take
        lat = done[:n_req] - arrive[:n_req]
        lat_ms = np.sort(lat * 1e3)
        q_ = lambda p: float(lat_ms[min(len(lat_ms) - 1,
                                        int(round(p * (len(lat_ms) - 1))))])
        return {
            "sent_per_s": round(n_req / float(done.max()), 1),
            "p50_ms": round(q_(0.50), 1),
            "p99_ms": round(q_(0.99), 1),
            "mean_latency_ms": round(float(lat_ms.mean()), 1),
        }

    out = {"batch": bs, "pool_chunks": pool_q, "n_req": args.n_req}
    for rate in [float(x) for x in args.rates.split(",")]:
        for mode, streaming in (("chunked", False), ("streaming", True)):
            r = run_mode(streaming, rate, args.n_req, seed=int(rate))
            out[f"rate{int(rate)}_{mode}"] = r
            print(f"# rate {int(rate)}/s {mode}: {r['sent_per_s']} sent/s, "
                  f"p50 {r['p50_ms']} ms, p99 {r['p99_ms']} ms", flush=True)
    print(json.dumps(out, indent=1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--calls", type=int, default=100)
    ap.add_argument("--batch-sizes", default="1,8,32")
    ap.add_argument("--cold", action="store_true",
                    help="skip the per-bucket pre-warm (measures an "
                         "unwarmed deployment; compiles land in the tail)")
    ap.add_argument("--arrival", action="store_true",
                    help="online arrival-process A/B: chunked vs "
                         "streaming-refill through serve.Translator")
    ap.add_argument("--rates", default="500,1000,2000",
                    help="Poisson arrival rates (sent/s) for --arrival")
    ap.add_argument("--n-req", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=32,
                    help="serving batch size (--arrival)")
    ap.add_argument("--pool-chunks", type=int, default=8,
                    help="max drain size in decode chunks (--arrival)")
    args = ap.parse_args()
    if args.arrival:
        arrival_main(args)
        return

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
