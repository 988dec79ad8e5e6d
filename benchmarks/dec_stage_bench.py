"""Per-op attribution of the decode mid-section on the REAL chip
(VERDICT r4 item 3: "name the ~104 us mid-section op-by-op").

Times CUMULATIVE PREFIXES of the production tabled decode step
(decode/models path: gy gather -> GRU1 -> qh GEMM -> attention -> xc GEMM
+ GRU2 -> readout activations) with the fetch-delta methodology
(dec_step_bench.py): each prefix runs as a data-dependent lax.scan chain
of R and 2R reps, (t(2R)-t(R))/R cancels the dispatch cost, and
consecutive-prefix DIFFERENCES attribute per-op device time.

Caveat (documented, inherent): removing later ops changes what XLA can
fuse into earlier ones, so a difference is "the marginal cost of adding
this op to the running program", not an isolated op time — but that IS
the quantity that matters for deciding what to attack: it is exactly what
the step would save if the op disappeared.

All legs are INTERLEAVED within each timing iteration (sequential
same-program runs drift 2x+ on the tunneled link).

Run ON TPU:  python benchmarks/dec_stage_bench.py [--reps 100]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=100)
    ap.add_argument("--iters", type=int, default=9)
    ap.add_argument("--dtypes", default="bfloat16")
    ap.add_argument("--shapes", default="128,5,32",
                    help="semicolon list of B,K,T")
    args = ap.parse_args()

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/vag_nmt_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    from vag_nmt_tpu.core.config import ModelConfig
    from vag_nmt_tpu.models import decoder as dec
    from vag_nmt_tpu.ops.attention import (
        bahdanau_attend_beams_q,
        precompute_ctx_proj,
    )
    from vag_nmt_tpu.ops.gru import gru_cell_from_gates, gru_cell_from_xgates
    from vag_nmt_tpu.utils.pytree import cast_floats

    R = args.reps
    for dt_name in args.dtypes.split(","):
        dt = jnp.bfloat16 if dt_name == "bfloat16" else jnp.float32
        for shape in args.shapes.split(";"):
            B, K, T = (int(x) for x in shape.split(","))
            cfg = ModelConfig(tgt_vocab_size=8000, emb_dim=256,
                              hidden_dim=512, dec_hidden_dim=512,
                              attn_dim=512, dropout=0.0,
                              compute_dtype=dt_name)
            params = dec.init_decoder(jax.random.key(0), cfg)
            params = cast_floats(params, dt)
            tables = jax.jit(dec.decode_tables)(params)
            H, C = 512, 1024
            A = params["attn"]["ua"].shape[1]
            rng = np.random.RandomState(0)
            tok0 = jnp.asarray(rng.randint(4, 8000, (B, K)), jnp.int32)
            s0 = jnp.asarray(rng.randn(B, K, H).astype(np.float32) * 0.1, dt)
            ctx = jnp.asarray(rng.randn(B, T, C).astype(np.float32) * 0.1, dt)
            ctxp = jax.jit(precompute_ctx_proj)(params["attn"], ctx)
            mask = jnp.asarray(
                (np.arange(T)[None]
                 < rng.randint(max(1, T // 2), T + 1, B)[:, None]
                 ).astype(np.float32))

            # Each stage fn: (tok(B,K), s(B*K,H)) -> (nxt tok, new s).
            # Carry updates keep every stage output LIVE (argmax/add terms
            # are (rows,)-sized — negligible next to the staged ops).
            def stage_gather(params, tables, ctx, ctxp, mask, tok, s):
                gy = jnp.take(tables["gy"], tok.reshape(-1), axis=0)
                nxt = (tok + (gy[:, 0] > 0).reshape(B, K)) % 8000
                return nxt.astype(jnp.int32), s

            def upto_gru1(params, tables, tok, s):
                gy = jnp.take(tables["gy"], tok.reshape(-1), axis=0)
                xg1 = gy[:, :3 * H]
                s_til = gru_cell_from_xgates(params["gru1"], xg1, s)
                return gy, s_til

            def stage_gru1(params, tables, ctx, ctxp, mask, tok, s):
                gy, s_til = upto_gru1(params, tables, tok, s)
                nxt = (tok + (s_til[:, 0] > 0).reshape(B, K)) % 8000
                return nxt.astype(jnp.int32), s_til

            def upto_qh(params, tables, tok, s):
                gy, s_til = upto_gru1(params, tables, tok, s)
                qh = jnp.dot(s_til, tables["w_s"],
                             preferred_element_type=jnp.float32)
                return gy, s_til, qh

            def stage_qh(params, tables, ctx, ctxp, mask, tok, s):
                gy, s_til, qh = upto_qh(params, tables, tok, s)
                nxt = (tok + (qh[:, 0] > 0).reshape(B, K)) % 8000
                return nxt.astype(jnp.int32), s_til

            def upto_attn(params, tables, ctx, ctxp, mask, tok, s):
                gy, s_til, qh = upto_qh(params, tables, tok, s)
                # f32 q, exactly as the production tabled path passes it
                c, w = bahdanau_attend_beams_q(
                    params["attn"], qh[:, :A].reshape(B, K, A),
                    ctx, ctxp, mask)
                return gy, s_til, qh, c.reshape(B * K, C)

            def stage_attn(params, tables, ctx, ctxp, mask, tok, s):
                gy, s_til, qh, c_flat = upto_attn(
                    params, tables, ctx, ctxp, mask, tok, s)
                nxt = (tok + (c_flat[:, 0] > 0).reshape(B, K)) % 8000
                return nxt.astype(jnp.int32), s_til

            def upto_gru2(params, tables, ctx, ctxp, mask, tok, s):
                gy, s_til, qh, c_flat = upto_attn(
                    params, tables, ctx, ctxp, mask, tok, s)
                g2 = params["gru2"]
                xc = jnp.dot(c_flat, tables["w_c"],
                             preferred_element_type=jnp.float32)
                s_new = gru_cell_from_gates(
                    xc[:, :3 * H] + g2["bi"], qh[:, A:] + g2["bh"], s_til)
                return gy, s_new, c_flat, xc

            def stage_gru2(params, tables, ctx, ctxp, mask, tok, s):
                gy, s_new, c_flat, xc = upto_gru2(
                    params, tables, ctx, ctxp, mask, tok, s)
                nxt = (tok + (xc[:, 0] > 0).reshape(B, K)) % 8000
                return nxt.astype(jnp.int32), s_new

            def stage_readout(params, tables, ctx, ctxp, mask, tok, s):
                gy, s_new, c_flat, xc = upto_gru2(
                    params, tables, ctx, ctxp, mask, tok, s)
                ty = gy[:, 3 * H:]
                t = dec._readout_t(params, ty, s_new, c_flat,
                                   tc=xc[:, 3 * H:])
                nxt = (tok + (t[:, 0] > 0).reshape(B, K)) % 8000
                return nxt.astype(jnp.int32), s_new

            STAGES = [
                ("gather", stage_gather),
                ("+gru1", stage_gru1),
                ("+qh_gemm", stage_qh),
                ("+attention", stage_attn),
                ("+xc_gemm_gru2", stage_gru2),
                ("+readout_acts", stage_readout),
            ]

            def make_run(stage_fn, n):
                @jax.jit
                def run(params, tables, ctx, ctxp, mask, tok, s):
                    def f(carry, _):
                        tok, s = carry
                        return stage_fn(params, tables, ctx, ctxp, mask,
                                        tok, s), ()
                    (tok, s), _ = jax.lax.scan(f, (tok, s), None, length=n)
                    return tok[0, 0], s[0, 0]

                run(params, tables, ctx, ctxp, mask, tok0,
                    s0.reshape(B * K, H))
                return lambda: np.asarray(
                    run(params, tables, ctx, ctxp, mask, tok0,
                        s0.reshape(B * K, H))[1])

            legs = {name: (make_run(fn, R), make_run(fn, 2 * R))
                    for name, fn in STAGES}
            t1s = {n: [] for n in legs}
            t2s = {n: [] for n in legs}
            for _ in range(args.iters):
                for n, (r1, r2) in legs.items():
                    t0 = time.perf_counter()
                    r1()
                    t1s[n].append(time.perf_counter() - t0)
                    t0 = time.perf_counter()
                    r2()
                    t2s[n].append(time.perf_counter() - t0)

            out = {"shape": f"B{B} K{K} T{T}", "dtype": dt_name}
            prev = 0.0
            for name, _ in STAGES:
                us = (min(t2s[name]) - min(t1s[name])) / R * 1e6
                out[name] = {"cum_us": round(us, 1),
                             "delta_us": round(us - prev, 1)}
                prev = us
            print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
