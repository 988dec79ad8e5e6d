"""Post-round-4 re-sweep of the decode knob grid on the REAL chip.

The fused readout->top-k kernel lost ~42 us/call and the table gather
~13 us/step in round 4, which moves the balance every earlier sweep was
measured under (chunk 128 "best" dates from the round-2 cost structure and
was re-confirmed round 3 pre-kernel-cut; slots=3 was picked when cascade
rounds were expensive). This re-runs the grid with the bench protocol's
corpus/checkpoint and INTERLEAVED legs (benchmarks/_timing.py lesson:
sequential same-program runs drift 2x+ on the tunnel hour to hour).

Grid: decode_batch_size x VAG_FRT_SLOTS. Each (bs, slots) leg is a fully
fused corpus decode; programs are cached per (config, env fingerprint) by
decode/translate.py, so leg order only pays compile once.

Run ON TPU:  python benchmarks/decode_knob_sweep.py [--reps 5]
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
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--batch-sizes", default="64,128,256")
    ap.add_argument("--slots", default="3,5")
    ap.add_argument("--unroll", default="1",
                    help="VAG_BEAM_UNROLL leg values (the r2 'stays 1' "
                         "verdict was measured with the slots-3 cond "
                         "machinery in the loop body; depth-K removes it)")
    args = ap.parse_args()

    from benchmarks.bench_setup import protocol_setup
    from vag_nmt_tpu.decode.translate import translate_corpus

    cfg0, params, examples, vocab, img_table, _ = protocol_setup()
    from bench import N_SENT

    bss = [int(x) for x in args.batch_sizes.split(",")]
    slot_list = [int(x) for x in args.slots.split(",")]
    unrolls = [int(x) for x in args.unroll.split(",")]
    legs = [(bs, sl, u) for bs in bss for sl in slot_list for u in unrolls]
    cfgs = {bs: cfg0.replace(decode=dict(decode_batch_size=bs)) for bs in bss}

    def run(bs, sl, u=1):
        os.environ["VAG_FRT_SLOTS"] = str(sl)
        os.environ["VAG_BEAM_UNROLL"] = str(u)
        try:
            t0 = time.perf_counter()
            hyps2, stats = translate_corpus(params, cfgs[bs], examples, vocab,
                                            img_table=img_table)
            dt = time.perf_counter() - t0
        finally:
            del os.environ["VAG_FRT_SLOTS"]
            del os.environ["VAG_BEAM_UNROLL"]
        return dt, hyps2, stats

    # Compile pass (untimed). Parity contract: slot depths are exact at a
    # FIXED chunk size (watermark rerun), so hyps must match across slots
    # per bs. Across chunk sizes hypotheses may differ on near-ties: a
    # row's chunk max-length T sets the attention reduction's padded
    # width, and fp32 reduction order over T is shape-dependent — inherent
    # to fixed-shape chunking, so cross-bs we only report the drift.
    ref_by_bs = {}
    ref0 = None
    for bs, sl, u in legs:
        _, hyps2, _ = run(bs, sl, u)
        if bs in ref_by_bs:
            assert hyps2 == ref_by_bs[bs], f"knob mismatch at bs={bs}"
        else:
            ref_by_bs[bs] = hyps2
            if ref0 is None:
                ref0 = hyps2
            else:
                drift = sum(a != b for a, b in zip(hyps2, ref0))
                print(f"# bs={bs}: {drift}/{len(ref0)} lines differ from "
                      f"bs={legs[0][0]} (near-tie flips)", flush=True)
    print("# slot-depth parity ok per chunk size", flush=True)

    times = {leg: [] for leg in legs}
    for rep in range(args.reps):
        for leg in legs:
            dt, _, stats = run(*leg)
            times[leg].append(dt)
        print(f"# rep {rep}: " + " ".join(
            f"{'/'.join(map(str, leg))}:{N_SENT/t:.0f}" for leg, t in
            ((leg, times[leg][-1]) for leg in legs)), flush=True)

    out = {}
    for (bs, sl, u), ts in times.items():
        med = sorted(ts)[len(ts) // 2]
        out[f"bs{bs}_slots{sl}_u{u}"] = {
            "median_sent_s": round(N_SENT / med, 1),
            "range": [round(N_SENT / max(ts), 1), round(N_SENT / min(ts), 1)],
        }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
