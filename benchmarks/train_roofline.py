"""Per-op decomposition of the TRAIN step from a real profiler trace.

The decode path has a measured per-step budget (docs/architecture.md,
roofline_check.py); this is the train-side counterpart (VERDICT r3 weak
item 6 follow-up): capture one jax.profiler trace of R pure-execution
train steps (staged batch, scanned dispatch — train_bench.py's runner)
and aggregate device time by op, so "what dominates the train step after
the dec-scan kernel" is a table, not a guess.

Run ON TPU:
    python benchmarks/train_roofline.py --preset m30k_ende_vag \
        --t-src 17 --t-tgt 17
    python benchmarks/train_roofline.py --preset ikea_vag \
        --t-src 128 --t-tgt 128 --batch 64 --reps 8
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

from benchmarks.roofline_check import analyze
from benchmarks.train_bench import make_runner, stage_batch, train_step_flops


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="m30k_ende_vag")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--t-src", type=int, default=17)
    ap.add_argument("--t-tgt", type=int, default=17)
    ap.add_argument("--reps", type=int, default=32)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--dec-scan", default="auto")
    ap.add_argument("--out", default="/tmp/vag_train_profile")
    args = ap.parse_args()

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/vag_nmt_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    from vag_nmt_tpu.core.config import preset
    from vag_nmt_tpu.train.state import create_train_state

    cfg = preset(args.preset).replace(
        model=dict(compute_dtype=args.dtype, dec_scan_impl=args.dec_scan),
        data=dict(batch_size=args.batch))
    B, T, Tt = args.batch, args.t_src, args.t_tgt
    batch = stage_batch(cfg, B, T, Tt)
    run = make_runner(cfg, batch, args.reps)
    state = jax.device_put(create_train_state(jax.random.key(0), cfg))

    run(state)                                   # compile + warm
    with jax.profiler.trace(args.out):
        t0 = time.perf_counter()
        run(state)
        elapsed = time.perf_counter() - t0

    summary = analyze(args.out)
    flops = train_step_flops(cfg, B, T, Tt)
    dev = [p for p in summary.get("planes", [])
           if "TPU" in p["name"] or "device" in p["name"].lower()]
    per_step = {}
    busy = None
    if dev:
        busy = dev[0]["busy_s"]
        per_step = {k: round(v / args.reps * 1e6, 1)
                    for k, v in dev[0]["top_ops_s"].items()}
    print(json.dumps({
        "preset": args.preset, "dtype": args.dtype,
        "B": B, "T": T, "Tt": Tt, "reps": args.reps,
        "dec_scan": args.dec_scan,
        "wall_ms_per_step": round(elapsed / args.reps * 1e3, 3),
        "device_busy_ms_per_step": (round(busy / args.reps * 1e3, 3)
                                    if busy is not None else None),
        "model_tflops_at_busy": (round(flops / (busy / args.reps) / 1e12, 1)
                                 if busy else None),
        "top_ops_us_per_step": per_step,
    }, indent=1))


if __name__ == "__main__":
    main()
