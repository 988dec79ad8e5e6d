"""Train-MFU ladder across ALL FIVE BASELINE presets (VERDICT r4 item 6).

One row per preset at its production bucket shapes (pure-execution ms/step
via train_bench's reps-delta runner, analytic model FLOPs from
core/flops), bf16 compute, production dec_scan/gru autos. Bucket widths
are multiples of 4 (the Pallas dec-scan KT requirement every production
bucket satisfies; the T=17 ad-hoc bench shape is the documented degenerate
case and is NOT a production shape).

MFU here = model TFLOP/s / 197 (v5e bf16 peak). The m30k presets run at
mean-length buckets (T=Tt=16, batch 64); IKEA at 128/128.

Run ON TPU:  python benchmarks/train_mfu_ladder.py [--iters 5]
Prints one JSON line per preset + a final summary table.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

from benchmarks.train_bench import make_runner, stage_batch, train_step_flops

# (preset, batch, T_src, T_tgt) — production bucket shapes per BASELINE.
LADDER = [
    ("m30k_ende_text", 64, 16, 16),
    ("m30k_ende_vag", 64, 16, 16),
    ("m30k_enfr_vag", 64, 16, 16),
    ("ikea_vag", 64, 128, 128),
    ("m30k_scaled", 64, 16, 16),
]

V5E_PEAK_TFLOPS = 197.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=32)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/vag_nmt_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    from vag_nmt_tpu.core.config import preset
    from vag_nmt_tpu.train.state import create_train_state

    rows = []
    legs = []
    for name, B, T, Tt in LADDER:
        # Chain length targets >= ~400 ms of device time per dispatch: at
        # ~1.5 ms/step a 32-step chain is ~45 ms, SMALLER than the
        # tunnel's one-sided jitter, and the reps-delta can go negative
        # (measured). Short-T presets chain 8x more steps.
        R = args.reps * 8 if T <= 32 else max(8, args.reps // 2)
        cfg = preset(name).replace(
            model=dict(compute_dtype=args.dtype),
            data=dict(batch_size=B))
        batch = stage_batch(cfg, B, T, Tt)
        legs.append((name, B, T, Tt, R, cfg,
                     make_runner(cfg, batch, R),
                     make_runner(cfg, batch, 2 * R), [], []))

    def fresh_state(cfg):
        return jax.device_put(
            create_train_state(jax.random.key(cfg.train.seed), cfg))

    for name, B, T, Tt, R, cfg, r1, r2, _, _ in legs:
        r1(fresh_state(cfg))
        r2(fresh_state(cfg))
        print(f"# compiled {name}", flush=True)

    # Interleave presets within each iteration (link drift hits all rows
    # equally — the defer_ab lesson).
    for _ in range(args.iters):
        for name, B, T, Tt, R, cfg, r1, r2, t1s, t2s in legs:
            st = fresh_state(cfg)
            t0 = time.perf_counter()
            r1(st)
            t1s.append(time.perf_counter() - t0)
            st = fresh_state(cfg)
            t0 = time.perf_counter()
            r2(st)
            t2s.append(time.perf_counter() - t0)

    for name, B, T, Tt, R, cfg, _, _, t1s, t2s in legs:
        per_step = (min(t2s) - min(t1s)) / R
        fl = train_step_flops(cfg, B, T, Tt)
        tfs = fl / per_step / 1e12
        row = {
            "preset": name, "batch": B, "t_src": T, "t_tgt": Tt,
            "dtype": args.dtype,
            "ms_per_step": round(per_step * 1e3, 3),
            "model_tflops": round(tfs, 2),
            "mfu": round(tfs / V5E_PEAK_TFLOPS, 4),
            "gflop_per_step": round(fl / 1e9, 2),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    print("# preset              ms/step  TFLOP/s   MFU")
    for r in rows:
        print(f"# {r['preset']:<18} {r['ms_per_step']:>7}  "
              f"{r['model_tflops']:>7}  {100 * r['mfu']:5.1f}%")


if __name__ == "__main__":
    main()
