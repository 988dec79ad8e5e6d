"""Beam top-k microbenchmark on the REAL chip: XLA fused TopK vs the Pallas
kernels (ops/pallas_topk.py) at the production decode shape.

Methodology (two lessons from the tunneled axon platform):
- chain data-dependent calls per dispatch (a dispatch round trip costs tens
  of ms, so single-call timing measures the tunnel);
- `block_until_ready` does NOT block on this platform (measured: flat 50 us
  for 1..400 chained topks) — force a REAL fetch (np.asarray) and report the
  REPS-DELTA per call: (t(2N calls) - t(N calls)) / N, which cancels the
  fixed dispatch+fetch cost.

Run ON TPU:  python benchmarks/topk_bench.py
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

REPS = 200


from benchmarks._timing import bench_delta as _bench_delta


def bench_delta(make_run, *args, warmup=1, iters=9):
    """See benchmarks/_timing.py (shared fetch-delta methodology)."""
    return _bench_delta(make_run, *args, reps=REPS, warmup=warmup,
                        iters=iters)


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/vag_nmt_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    from vag_nmt_tpu.ops.pallas_topk import beam_topk

    shapes = [(128, 5, 8000), (64, 5, 8000), (128, 5, 16384), (128, 12, 8000)]
    impls = ["xla", "pallas_rows", "pallas_lanes"]
    rows = []
    for B, K, V in shapes:
        rng = np.random.RandomState(0)
        logits = jnp.asarray(rng.randn(B, K, V).astype(np.float32))
        scores = jnp.asarray(rng.randn(B, K).astype(np.float32))
        finished = jnp.asarray(rng.rand(B, K) < 0.2)
        for impl in impls:
            def make_run(n, im=impl):
                @jax.jit
                def run(lg, sc, fin):
                    def body(i, carry):
                        sc_c = carry
                        v, idx = beam_topk(lg, sc_c, fin, impl=im)
                        # feed values AND indices forward so neither output
                        # can be dead-code-eliminated
                        return (sc_c * 0.9 + v * 0.1
                                + idx.astype(jnp.float32) * 1e-9)
                    return jax.lax.fori_loop(0, n, body, sc)
                return run
            try:
                t = bench_delta(make_run, logits, scores, finished)
                err = ""
            except Exception as e:
                t = float("nan")
                err = f"{type(e).__name__}: {e}"[:200]
            rows.append({"impl": impl, "B": B, "K": K, "V": V,
                         "us_per_call": round(t * 1e6, 1), "error": err})
            print(json.dumps(rows[-1]), flush=True)

    for B, K, V in shapes:
        r = {x["impl"]: x for x in rows
             if (x["B"], x["K"], x["V"]) == (B, K, V)}
        if r["xla"]["error"]:
            # a failed baseline would make every ratio NaN (invalid JSON)
            print(json.dumps({"summary": f"B{B}_K{K}_V{V}",
                              "error": "xla baseline failed"}), flush=True)
            continue
        base = r["xla"]["us_per_call"]
        print(json.dumps({
            "summary": f"B{B}_K{K}_V{V}",
            **{f"{im}_over_xla": round(r[im]["us_per_call"] / base, 2)
               for im in impls[1:] if not r[im]["error"]},
        }), flush=True)


if __name__ == "__main__":
    main()
