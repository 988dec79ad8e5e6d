"""Fused decode-step kernel vs the XLA tabled step on the REAL chip.

Measures decode_step_beams_readout (the production mid-section: table
gather -> GRU1 -> attention -> GRU2 -> readout activations) with
VAG_DEC_STEP on/off, fetch-delta methodology, LEGS INTERLEAVED within each
iteration (sequential runs drift 2x+ on this tunnel — see
benchmarks/train_bench.py).

Both legs trace their program while their env value is active (the
defer_ab lesson: jit traces lazily, so the env must be set at first CALL).

Run ON TPU:  python benchmarks/dec_step_bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

REPS = 100

SHAPES = [
    ("m30k  B128 K5 T32", 128, 5, 32),
    ("m30k  B128 K5 T16", 128, 5, 16),
    ("ikea  B128 K5 T128", 128, 5, 128),
]


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/vag_nmt_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    from vag_nmt_tpu.core.config import ModelConfig
    from vag_nmt_tpu.models import decoder as dec
    from vag_nmt_tpu.ops.attention import precompute_ctx_proj
    from vag_nmt_tpu.utils.pytree import cast_floats

    for dt_name in ("bfloat16", "float32"):
        dt = jnp.bfloat16 if dt_name == "bfloat16" else jnp.float32
        for label, B, K, T in SHAPES:
            cfg = ModelConfig(tgt_vocab_size=8000, emb_dim=256,
                              hidden_dim=512, dec_hidden_dim=512,
                              attn_dim=512, dropout=0.0,
                              compute_dtype=dt_name)
            params = dec.init_decoder(jax.random.key(0), cfg)
            params = cast_floats(params, dt)
            tables = jax.jit(dec.decode_tables)(params)
            H, C = 512, 1024
            rng = np.random.RandomState(0)
            tok = jnp.asarray(rng.randint(4, 8000, (B, K)), jnp.int32)
            s = jnp.asarray(rng.randn(B, K, H).astype(np.float32) * 0.1, dt)
            ctx = jnp.asarray(rng.randn(B, T, C).astype(np.float32) * 0.1, dt)
            ctxp = jax.jit(precompute_ctx_proj)(params["attn"], ctx)
            mask = jnp.asarray(
                (np.arange(T)[None]
                 < rng.randint(max(1, T // 2), T + 1, B)[:, None]
                 ).astype(np.float32))

            def make_run(n, env):
                os.environ["VAG_DEC_STEP"] = env

                # params/tables/ctx must be ARGUMENTS: a closure-captured
                # array is baked into the executable as a constant (the gy
                # table alone is 57 MB -> 360 MB executables, minutes of
                # compile).
                @jax.jit
                def run(params, tables, ctx, ctxp, mask, tok, s):
                    def f(carry, _):
                        tok, s = carry
                        s_new, t, _, _ = dec.decode_step_beams_readout(
                            params, cfg, tok, s, ctx, ctxp, mask, tables)
                        # data-dependence: next token from t's argmax cols
                        nxt = jnp.argmax(
                            t.reshape(B, K, -1), axis=-1).astype(jnp.int32)
                        return (nxt % 8000, s_new), ()
                    (tok, s), _ = jax.lax.scan(f, (tok, s), None, length=n)
                    return tok[0, 0], s[0, 0, 0]

                # trace NOW, while the env value is active
                run(params, tables, ctx, ctxp, mask, tok, s)
                return lambda: np.asarray(
                    run(params, tables, ctx, ctxp, mask, tok, s)[1])

            legs = {}
            for env in ("off", "on"):
                legs[env] = (make_run(REPS, env), make_run(2 * REPS, env))
            t1s = {e: [] for e in legs}
            t2s = {e: [] for e in legs}
            for _ in range(9):
                for e, (r1, r2) in legs.items():
                    t0 = time.perf_counter()
                    r1()
                    t1s[e].append(time.perf_counter() - t0)
                    t0 = time.perf_counter()
                    r2()
                    t2s[e].append(time.perf_counter() - t0)
            out = {"shape": label, "dtype": dt_name}
            for e in legs:
                us = (min(t2s[e]) - min(t1s[e])) / REPS * 1e6
                out["xla_us" if e == "off" else "kernel_us"] = round(us, 1)
            out["speedup"] = round(out["xla_us"] / out["kernel_us"], 2)
            print(json.dumps(out), flush=True)
    os.environ.pop("VAG_DEC_STEP", None)


if __name__ == "__main__":
    main()
