"""Interleaved A/B of the attention energy-broadcast dtype on the REAL
chip (r5: the (B,K,T,A) tanh broadcast is the decode mid-section's
largest term — 51 of ~97 us at T=32, dec_stage_bench.py).

Times the FULL production mid-section (gather -> ... -> readout acts,
dec_stage_bench's last prefix) with VAG_ATTN_E_DTYPE bf16 vs fp32, legs
traced under their env value (jit traces lazily — the dec_step_bench
lesson) and INTERLEAVED within each timing iteration so link drift
cancels. Sequential same-program runs on this tunnel drift 2x+; the
sequential dec_stage_bench comparison (97.7 vs 108.9 us) is NOT
trustworthy on its own — this is.

Run ON TPU:  python benchmarks/attn_ab.py [--reps 100]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=100)
    ap.add_argument("--iters", type=int, default=9)
    ap.add_argument("--shapes", default="128,5,32;128,5,16")
    args = ap.parse_args()

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/vag_nmt_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    from vag_nmt_tpu.core.config import ModelConfig
    from vag_nmt_tpu.models import decoder as dec
    from vag_nmt_tpu.ops.attention import precompute_ctx_proj
    from vag_nmt_tpu.utils.pytree import cast_floats

    R = args.reps
    for shape in args.shapes.split(";"):
        B, K, T = (int(x) for x in shape.split(","))
        cfg = ModelConfig(tgt_vocab_size=8000, emb_dim=256,
                          hidden_dim=512, dec_hidden_dim=512,
                          attn_dim=512, dropout=0.0,
                          compute_dtype="bfloat16")
        params = dec.init_decoder(jax.random.key(0), cfg)
        params = cast_floats(params, jnp.bfloat16)
        tables = jax.jit(dec.decode_tables)(params)
        H = 512
        rng = np.random.RandomState(0)
        tok0 = jnp.asarray(rng.randint(4, 8000, (B, K)), jnp.int32)
        s0 = jnp.asarray(rng.randn(B, K, H).astype(np.float32) * 0.1,
                         jnp.bfloat16)
        ctx = jnp.asarray(rng.randn(B, T, 1024).astype(np.float32) * 0.1,
                          jnp.bfloat16)
        ctxp = jax.jit(precompute_ctx_proj)(params["attn"], ctx)
        mask = jnp.asarray(
            (np.arange(T)[None]
             < rng.randint(max(1, T // 2), T + 1, B)[:, None]
             ).astype(np.float32))

        def make_run(n, env):
            os.environ["VAG_ATTN_E_DTYPE"] = env

            @jax.jit
            def run(params, tables, ctx, ctxp, mask, tok, s):
                def f(carry, _):
                    tok, s = carry
                    s_new, t, _, _ = dec.decode_step_beams_readout(
                        params, cfg, tok, s, ctx, ctxp, mask, tables)
                    nxt = (tok + (t[:, 0] > 0).reshape(B, K)) % 8000
                    return (nxt.astype(jnp.int32), s_new), ()
                (tok, s), _ = jax.lax.scan(f, (tok, s), None, length=n)
                return tok[0, 0], s[0, 0, 0]

            run(params, tables, ctx, ctxp, mask, tok0, s0)  # trace now
            return lambda: np.asarray(
                run(params, tables, ctx, ctxp, mask, tok0, s0)[1])

        legs = {env: (make_run(R, env), make_run(2 * R, env))
                for env in ("bf16", "fp32")}
        os.environ.pop("VAG_ATTN_E_DTYPE", None)
        t1s = {e: [] for e in legs}
        t2s = {e: [] for e in legs}
        for _ in range(args.iters):
            for e, (r1, r2) in legs.items():
                t0 = time.perf_counter()
                r1()
                t1s[e].append(time.perf_counter() - t0)
                t0 = time.perf_counter()
                r2()
                t2s[e].append(time.perf_counter() - t0)
        out = {"shape": f"B{B} K{K} T{T}"}
        for e in legs:
            out[f"{e}_us"] = round(
                (min(t2s[e]) - min(t1s[e])) / R * 1e6, 1)
        out["bf16_speedup"] = round(out["fp32_us"] / out["bf16_us"], 3)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
