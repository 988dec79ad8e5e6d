"""Interleaved A/B of the production beam-loop body with vs without the
per-vocab decode tables (models.decoder.decode_tables).

benchmarks/decode_bench.py's sequential fetch-delta cases drift too much on
the tunneled chip to resolve a ~tens-of-us difference (the same case moved
2x between runs). Here the two variants' (N, 2N) fetch-delta measurements
INTERLEAVE inside one iteration loop, so slow-drift affects both equally,
and the reported statistic is the median over many iterations of the
per-iteration delta — plus min-statistics for cross-checking.

Run ON TPU:  python benchmarks/tabled_ab.py [iters]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

REPS = 100


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/vag_nmt_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 15

    from vag_nmt_tpu.core.config import preset
    from vag_nmt_tpu.models.decoder import decode_tables
    from vag_nmt_tpu.models.model import DecodeState, decode_step_topk, init_params
    from vag_nmt_tpu.utils.pytree import cast_floats

    cfg = preset("m30k_ende_vag").replace(model=dict(compute_dtype="bfloat16"))
    m = cfg.model
    B, K, V, T = 128, 5, m.tgt_vocab_size, 32
    H = m.dec_hidden_dim

    params = cast_floats(init_params(jax.random.key(0), m), jnp.bfloat16)
    rng = np.random.RandomState(0)
    state = DecodeState(
        ctx=jnp.asarray(rng.randn(B, T, m.ctx_dim), jnp.bfloat16),
        ctx_proj=jnp.asarray(rng.randn(B, T, m.attn_dim), jnp.bfloat16),
        src_mask=jnp.asarray(rng.rand(B, T) < 0.8, jnp.float32),
        s0=jnp.zeros((B, H), jnp.bfloat16))
    scores0 = jnp.asarray(rng.randn(B, K), jnp.float32)
    finished0 = jnp.asarray(rng.rand(B, K) < 0.2)
    tok0 = jnp.asarray(rng.randint(4, V, (B, K)), jnp.int32)
    tokens0 = jnp.zeros((B, K, 64), jnp.int32)
    s0 = jnp.asarray(rng.randn(B, K, H), jnp.bfloat16)
    tables = decode_tables(params["decoder"])

    def make_run(n, tab):
        @jax.jit
        def run(s, scores, tokens):
            def body(t, carry):
                tok, s, scores, tokens = carry
                s_new, top_scores, idx = decode_step_topk(
                    params, m, tok, s, state, scores, finished0,
                    impl="fused", tables=tab)
                beam_idx = idx // V
                tokn = (idx % V).astype(jnp.int32)

                def sel(x):
                    return jnp.take_along_axis(
                        x, beam_idx.reshape(
                            beam_idx.shape + (1,) * (x.ndim - 2)), axis=1)

                tokens = sel(tokens).at[:, :, t % 64].set(tokn)
                return tokn, sel(s_new), top_scores, tokens
            return jax.lax.fori_loop(0, n, body, (tok0, s, scores, tokens))
        return run

    gather_only = {k: v for k, v in tables.items() if k == "gy"}
    runs = {
        "untabled": (make_run(REPS, None), make_run(2 * REPS, None)),
        "tab_gather": (make_run(REPS, gather_only),
                       make_run(2 * REPS, gather_only)),
        "tab_fused": (make_run(REPS, tables), make_run(2 * REPS, tables)),
    }

    def fetch(r):
        jax.tree.map(np.asarray, r(s0, scores0, tokens0))

    for pair in runs.values():            # warm both compiles
        fetch(pair[0])
        fetch(pair[1])

    deltas = {k: [] for k in runs}
    t1 = {k: [] for k in runs}
    t2 = {k: [] for k in runs}
    for _ in range(iters):
        for k, (rn, r2n) in runs.items():
            t0 = time.perf_counter()
            fetch(rn)
            a = time.perf_counter() - t0
            t0 = time.perf_counter()
            fetch(r2n)
            b = time.perf_counter() - t0
            t1[k].append(a)
            t2[k].append(b)
            deltas[k].append((b - a) / REPS)
    out = {}
    for k in runs:
        med = float(np.median(deltas[k]) * 1e6)
        mn = float((min(t2[k]) - min(t1[k])) / REPS * 1e6)
        out[k] = {"median_us": round(med, 1), "min_us": round(mn, 1)}
        print(f"{k:10s} median {med:8.1f} us/step   min-stat {mn:8.1f} us/step",
              flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
