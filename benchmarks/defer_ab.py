"""Interleaved A/B of chunk-level deferred exactness (VAG_FRT_DEFER) vs the
per-step lax.cond fallback, at the production beam-search level.

The per-step cond was measured at ~17 us/step in a real trace
(docs/architecture.md roofline section); deferring recovery to a whole-chunk
rerun removes it from the hot loop. This harness times FULL `beam_search`
programs (the real while_loop, early exit, gathers) with an untrained model
so no row ever emits <eos> — the trip count is exactly max_len — and derives
per-step cost as the fetch-delta between max_len=N and max_len=2N programs.
The two legs' measurements interleave within each iteration so tunnel drift
hits both equally.

Run ON TPU:  python benchmarks/defer_ab.py [iters]
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

N = 64  # base max_len; the 2N leg runs 128


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/vag_nmt_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 15

    from vag_nmt_tpu.core.config import preset
    from vag_nmt_tpu.decode.beam import beam_search
    from vag_nmt_tpu.models.decoder import decode_tables
    from vag_nmt_tpu.models.model import DecodeState, init_params
    from vag_nmt_tpu.utils.pytree import cast_floats

    cfg = preset("m30k_ende_vag").replace(model=dict(compute_dtype="bfloat16"))
    m = cfg.model
    B, K, T = 128, 5, 32
    H = m.dec_hidden_dim

    params = cast_floats(init_params(jax.random.key(0), m), jnp.bfloat16)
    rng = np.random.RandomState(0)
    state = DecodeState(
        ctx=jnp.asarray(rng.randn(B, T, m.ctx_dim), jnp.bfloat16),
        ctx_proj=jnp.asarray(rng.randn(B, T, m.attn_dim), jnp.bfloat16),
        src_mask=jnp.asarray(rng.rand(B, T) < 0.8, jnp.float32),
        s0=jnp.zeros((B, H), jnp.bfloat16))
    tables = decode_tables(params["decoder"])

    def fetch(r):
        jax.tree.map(np.asarray, r(params, state))

    def build(defer: str):
        # deferred_exactness_active reads the env at TRACE time — and
        # jax.jit traces LAZILY at the first CALL, not at closure creation.
        # Each leg must therefore be warmed (traced) while its env setting
        # is still active, BEFORE the env is restored. (Review finding: an
        # earlier version of this harness popped the env before any call,
        # so both legs traced the same program and the A/B measured pure
        # run-to-run drift.)
        os.environ["VAG_FRT_DEFER"] = defer

        def make(max_len):
            @jax.jit
            def run(params, state):
                r = beam_search(params, m, state, beam_size=K,
                                max_len=max_len, tables=tables)
                return r.best_tokens, r.best_lengths
            return run

        pair = make(N), make(2 * N)
        fetch(pair[0])          # force tracing under THIS env setting
        fetch(pair[1])
        return pair

    runs = {"stepcond": build("0"), "defer": build("1")}
    os.environ.pop("VAG_FRT_DEFER", None)

    deltas = {k: [] for k in runs}
    for _ in range(iters):
        for k, (rn, r2n) in runs.items():
            t0 = time.perf_counter()
            fetch(rn)
            a = time.perf_counter() - t0
            t0 = time.perf_counter()
            fetch(r2n)
            b = time.perf_counter() - t0
            deltas[k].append((b - a) / N)
    out = {}
    for k in runs:
        med = float(np.median(deltas[k]) * 1e6)
        out[k] = {"median_us": round(med, 1)}
        print(f"{k:9s} median {med:8.1f} us/step", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
