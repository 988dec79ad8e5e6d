"""A/B: no-repeat n-gram blocking through the fused readout->top-k kernel
(in-kernel dense vocab mask, r4) vs the old forced-unfused fallback, vs the
unblocked fused baseline — INTERLEAVED legs on the bench-protocol
corpus/checkpoint (benchmarks/_timing.py lesson: sequential same-program
runs drift 2x+ on the tunnel hour to hour).

Blocking is SEMANTIC, so the two blocked legs must agree with each other
(same ban semantics either path) but not with the unblocked leg.

Run ON TPU:  python benchmarks/block_ab.py [--reps 5] [--n 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--n", type=int, default=2, help="block_ngram order")
    args = ap.parse_args()

    from benchmarks.bench_setup import protocol_setup
    from vag_nmt_tpu.decode.translate import translate_corpus
    from bench import N_SENT

    cfg, params, examples, vocab, img_table, _ = protocol_setup()

    legs = {
        "fused_noblock": {"VAG_READOUT_TOPK": "fused", "VAG_BLOCK_NGRAM": "0"},
        "fused_block": {"VAG_READOUT_TOPK": "fused",
                        "VAG_BLOCK_NGRAM": str(args.n)},
        "unfused_block": {"VAG_READOUT_TOPK": "unfused",
                          "VAG_BLOCK_NGRAM": str(args.n)},
    }

    def run(env):
        for k, v in env.items():
            os.environ[k] = v
        try:
            t0 = time.perf_counter()
            hyps, stats = translate_corpus(params, cfg, examples, vocab,
                                           img_table=img_table)
            dt = time.perf_counter() - t0
        finally:
            for k in env:
                del os.environ[k]
        return dt, hyps, stats

    # compile pass + parity: both blocked paths implement the same ban
    hyps = {}
    for name, env in legs.items():
        _, h, _ = run(env)
        hyps[name] = h
    assert hyps["fused_block"] == hyps["unfused_block"], \
        "in-kernel ban disagrees with the unfused logits scatter"
    changed = sum(a != b for a, b in
                  zip(hyps["fused_block"], hyps["fused_noblock"]))
    print(f"# blocked==unfused-blocked ok; blocking changed "
          f"{changed}/{len(examples)} lines", flush=True)

    times = {name: [] for name in legs}
    for rep in range(args.reps):
        for name, env in legs.items():
            dt, _, _ = run(env)
            times[name].append(dt)
        print(f"# rep {rep}: " + " ".join(
            f"{n}:{N_SENT/t:.0f}" for n, t in
            ((n, times[n][-1]) for n in legs)), flush=True)

    out = {}
    for name, ts in times.items():
        med = sorted(ts)[len(ts) // 2]
        out[name] = {
            "median_sent_s": round(N_SENT / med, 1),
            "range": [round(N_SENT / max(ts), 1), round(N_SENT / min(ts), 1)],
        }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
