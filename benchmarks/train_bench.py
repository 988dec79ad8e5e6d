"""Pure-execution train-step microbenchmark on the REAL chip.

Measures the flagship (m30k_ende_vag-shaped) jitted train step's DEVICE
time per step — the "pure execution" row of README's completion-rate
ladder — using the same reps-delta methodology as kernel_bench.py: chain
R data-dependent steps inside one dispatch (the donated TrainState makes
them data-dependent by construction via lax.scan), force a result fetch,
and report (t(2R) - t(R)) / R with min-statistics over the iters (the
tunneled link adds one-sided jitter; `block_until_ready` does not block
on this platform).

The batch is staged ON DEVICE once and reused for every scanned step, so
host->device feed cost is excluded by design — this isolates the XLA
program's execution rate (forward + backward + Adam), the number the
teacher-forced-scan structure work (hoisted vocab GEMM) moves.

Run ON TPU:  python benchmarks/train_bench.py [--steps 64] [--batch 64]
Prints one JSON line per (preset, dtype) with ms/step and model TFLOP/s.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def stage_batch(cfg, B, T, Tt, seed=0):
    """Synthetic classic-keys batch at flagship shapes, staged on device."""
    rng = np.random.RandomState(seed)
    m = cfg.model
    src_lens = rng.randint(max(2, T // 2), T + 1, B)
    tgt_lens = rng.randint(max(2, Tt // 2), Tt, B)
    src = rng.randint(4, m.src_vocab_size, (B, T)).astype(np.int32)
    tgt = rng.randint(4, m.tgt_vocab_size, (B, Tt)).astype(np.int32)
    spos = np.arange(T)[None, :]
    tpos = np.arange(Tt)[None, :]
    batch = {
        "src": src,
        "src_mask": (spos < src_lens[:, None]).astype(np.float32),
        "tgt_in": np.concatenate(
            [np.full((B, 1), 2, np.int32), tgt[:, :-1]], axis=1),
        "tgt_out": tgt,
        "tgt_mask": (tpos < tgt_lens[:, None]).astype(np.float32),
    }
    if m.multimodal:
        batch["img"] = rng.randn(B, m.img_feat_dim).astype(np.float32)
        batch["sample_mask"] = np.ones((B,), np.float32)
    return jax.device_put(jax.tree.map(jnp.asarray, batch))


def make_runner(cfg, batch, R):
    """One jitted dispatch = R sequential train steps on the staged batch.

    Reuses train.step's single-step body (the production numerics) via a
    lax.scan over R iterations; the carried TrainState makes every step
    data-dependent on the last, so the device cannot overlap them."""
    from vag_nmt_tpu.train.step import _make_step_body
    from vag_nmt_tpu.train.state import make_optimizer

    body = _make_step_body(cfg, make_optimizer(cfg), False)
    rng = jax.random.key(1)

    @jax.jit
    def run(state):
        def f(st, _):
            st, aux = body(st, batch, rng, None)
            return st, ()

        state, _ = jax.lax.scan(f, state, None, length=R)
        return state.params["decoder"]["readout"]["b"][0], state.step

    return lambda st: np.asarray(run(st)[0])


def train_step_flops(cfg, B, T, Tt):
    """Analytic model FLOPs per train step (fwd+bwd ~= 3x fwd)."""
    from vag_nmt_tpu.core.flops import train_step_flops as f

    return f(cfg, B, T, Tt)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="m30k_ende_vag")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--t-src", type=int, default=17)
    ap.add_argument("--t-tgt", type=int, default=17)
    ap.add_argument("--reps", type=int, default=32)
    ap.add_argument("--iters", type=int, default=7)
    ap.add_argument("--dtypes", default="bfloat16,float32")
    ap.add_argument("--dec-scan", default="auto",
                    help="dec_scan_impl: auto|xla|pallas, or a comma list "
                         "(e.g. xla,pallas) for an INTERLEAVED A/B — the "
                         "legs alternate within each timing iteration so "
                         "session drift cancels (the defer_ab lesson; "
                         "sequential runs of this bench have measured the "
                         "same program 1.8 and 4.6 ms/step minutes apart)")
    ap.add_argument("--gru", default="auto", choices=("auto", "xla", "pallas"),
                    help="encoder gru_impl A/B")
    args = ap.parse_args()

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/vag_nmt_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    from vag_nmt_tpu.core.config import preset
    from vag_nmt_tpu.train.state import create_train_state

    for dt in args.dtypes.split(","):
        legs = []  # (dec_scan_label, cfg, run_n, run_2n, t1s, t2s)
        B, T, Tt = args.batch, args.t_src, args.t_tgt
        R = args.reps
        for ds in args.dec_scan.split(","):
            cfg = preset(args.preset).replace(
                model=dict(compute_dtype=dt, dec_scan_impl=ds,
                           gru_impl=args.gru),
                data=dict(batch_size=args.batch),
            )
            batch = stage_batch(cfg, B, T, Tt)
            legs.append((ds, cfg, make_runner(cfg, batch, R),
                         make_runner(cfg, batch, 2 * R), [], []))

        def fresh_state(cfg):
            return jax.device_put(
                create_train_state(jax.random.key(cfg.train.seed), cfg))

        # warmup/compile every program before any timing
        for _, cfg, run_n, run_2n, _, _ in legs:
            run_n(fresh_state(cfg))
            run_2n(fresh_state(cfg))
        # interleave the legs within each iteration so link/chip drift
        # hits all of them equally
        for _ in range(args.iters):
            for _, cfg, run_n, run_2n, t1s, t2s in legs:
                st = fresh_state(cfg)
                t0 = time.perf_counter()
                run_n(st)
                t1s.append(time.perf_counter() - t0)
                st = fresh_state(cfg)
                t0 = time.perf_counter()
                run_2n(st)
                t2s.append(time.perf_counter() - t0)
        for ds, cfg, _, _, t1s, t2s in legs:
            per_step = (min(t2s) - min(t1s)) / R
            try:
                fl = train_step_flops(cfg, B, T, Tt)
                tfs = fl / per_step / 1e12
            except Exception:
                fl, tfs = None, None
            print(json.dumps({
                "preset": args.preset, "dtype": dt, "batch": B,
                "dec_scan": ds, "gru": args.gru,
                "t_src": T, "t_tgt": Tt,
                "ms_per_step": round(per_step * 1e3, 3),
                "tflops": None if tfs is None else round(tfs, 2),
            }), flush=True)


if __name__ == "__main__":
    main()
