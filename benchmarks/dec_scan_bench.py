"""Pallas-vs-XLA teacher-forced decoder scan microbenchmark on the REAL chip
(VERDICT r3 item 6).

Measures the train-path decoder recurrence — GRU1 -> Bahdanau attention ->
GRU2 -> readout, the scan inside models/decoder.teacher_forced_logits — at
flagship (m30k) and IKEA-config shapes, forward and forward+backward:

    xla     lax.scan body (the numerics oracle)
    pallas  fused time-blocked kernel (ops/pallas_dec_scan.py)

The XLA scan re-streams ~14.5 MB of recurrent weights plus the batch's
ctx/ctx_proj from HBM on every one of the Tt steps; the kernel keeps them
VMEM-resident, so the expected win grows with Tt (the IKEA config's Tt=128
is the target regime).

Run ON TPU: python benchmarks/dec_scan_bench.py [--fwd-only]
Prints one JSON line per (impl, shape, mode) plus a winner summary; paste
into README/docs when the numbers move.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks._timing import bench_delta

REPS = 30        # fwd+bwd scans per dispatch (each ~1-15 ms)
REPS_FWD = 60


# (label, B, T_src, Tt, E, H_enc, H_dec, A) — C = 2*H_enc, R = E
SHAPES = [
    ("m30k   B64  T32 Tt32", 64, 32, 32, 256, 512, 512, 512),
    ("m30k   B128 T32 Tt32", 128, 32, 32, 256, 512, 512, 512),
    ("ikea   B64  T128 Tt128", 64, 128, 128, 256, 512, 512, 512),
    ("scaled B64  T64 Tt64", 64, 64, 64, 512, 512, 512, 512),
]


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/vag_nmt_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    from vag_nmt_tpu.core.config import ModelConfig
    from vag_nmt_tpu.models import decoder as dec

    backend = jax.default_backend()
    dtypes = ["float32", "bfloat16"]
    fwd_only = "--fwd-only" in sys.argv
    results = []

    for label, B, T, Tt, E, He, H, A in SHAPES:
        C = 2 * He
        rng = np.random.RandomState(0)
        tgt_in = jnp.asarray(rng.randint(0, 512, (B, Tt)), jnp.int32)
        lens = rng.randint(max(1, T // 2), T + 1, B)
        mask_np = (np.arange(T)[None] < lens[:, None]).astype(np.float32)

        for dt_name in dtypes:
            dt = jnp.bfloat16 if dt_name == "bfloat16" else jnp.float32
            base = dict(tgt_vocab_size=512, emb_dim=E, hidden_dim=He,
                        dec_hidden_dim=H, attn_dim=A, dropout=0.0,
                        compute_dtype=dt_name)
            params = dec.init_decoder(jax.random.key(0), ModelConfig(**base))
            s0 = jnp.asarray(rng.randn(B, H).astype(np.float32) * 0.1, dt)
            ctx = jnp.asarray(rng.randn(B, T, C).astype(np.float32) * 0.1, dt)
            mask = jnp.asarray(mask_np)

            for impl in ("xla", "pallas"):
                cfg = ModelConfig(**base, dec_scan_impl=impl)

                def fwd_loss(params, s0, ctx):
                    lg = dec.teacher_forced_logits(
                        params, cfg, tgt_in, s0, ctx, mask)
                    return (lg * 1e-3).sum()

                # The carry (s0) must chain through each iteration or XLA
                # hoists the loop-invariant body out of the fori_loop and
                # the delta measures nothing (kernel_bench pattern).
                def make_fwd(n, cfg=cfg):
                    @jax.jit
                    def run(params, s0, ctx):
                        def body(i, s):
                            lg = dec.teacher_forced_logits(
                                params, cfg, tgt_in, s, ctx, mask)
                            leak = (lg * 1e-3).sum() * 1e-9
                            return s * 0.999 + leak.astype(s.dtype)
                        return jax.lax.fori_loop(0, n, body, s0)
                    return run

                def make_fb(n):
                    g = jax.grad(fwd_loss, argnums=(0, 1, 2))

                    @jax.jit
                    def run(params, s0, ctx):
                        def body(i, s):
                            gs = g(params, s, ctx)
                            return s * 0.999 + gs[1].astype(s.dtype) * 1e-6
                        return jax.lax.fori_loop(0, n, body, s0)
                    return run

                row = {"bench": "dec_scan", "impl": impl, "shape": label,
                       "dtype": dt_name, "backend": backend}
                row["fwd_us"] = round(bench_delta(
                    make_fwd, params, s0, ctx, reps=REPS_FWD) * 1e6, 1)
                if not fwd_only:
                    row["fwdbwd_us"] = round(bench_delta(
                        make_fb, params, s0, ctx, reps=REPS) * 1e6, 1)
                print(json.dumps(row), flush=True)
                results.append(row)

    # winner summary
    for mode in (["fwd_us"] if fwd_only else ["fwd_us", "fwdbwd_us"]):
        print(f"--- {mode} speedup (xla / pallas) ---")
        for label, *_ in SHAPES:
            for dt_name in dtypes:
                rows = {r["impl"]: r for r in results
                        if r["shape"] == label and r["dtype"] == dt_name}
                if len(rows) == 2 and mode in rows["xla"]:
                    sp = rows["xla"][mode] / max(rows["pallas"][mode], 1e-9)
                    print(f"{label:26s} {dt_name:9s} {sp:5.2f}x "
                          f"({rows['xla'][mode]:9.1f} -> "
                          f"{rows['pallas'][mode]:9.1f} us)")


if __name__ == "__main__":
    main()
