"""Pallas-vs-XLA GRU scan microbenchmark on the REAL chip (VERDICT r1 item 1).

Measures the masked bidirectional GRU scan — the encoder's recurrence and the
only op with a hand-written kernel — forward and forward+backward, at
flagship shapes, for every available implementation:

    xla     lax.scan oracle (ops/gru.py)
    pallas  fused Pallas kernel (ops/pallas_gru.py)

Run ON TPU (the default backend outside pytest):  python benchmarks/kernel_bench.py
Prints one JSON line per (impl, shape, mode) plus a winner summary; paste the
table into README/PARITY when the numbers move.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


REPS = 400       # fwd+bwd calls per dispatch (each ~200-700 us)
REPS_FWD = 2000  # forward calls per dispatch (each ~20-100 us)
# Chain data-dependent ops inside ONE jit (a dispatch round trip costs tens
# of ms through the tunnel; fori_loop trip count is compile-free, so large
# REPS costs only runtime). Timing is the REPS-DELTA with a FORCED result
# fetch (np.asarray): `block_until_ready` does NOT actually block on the
# tunneled axon platform (measured flat ~50 us for 1..400 chained ops).
# MIN over iters for both endpoints: the tunnel adds one-sided jitter of up
# to tens of ms per call (median-of-7 deltas still came out negative for
# sub-100-us ops), and min is the standard interference-free statistic.


from benchmarks._timing import bench_delta as _bench_delta


def bench_delta(make_fn, *args, warmup=1, iters=9, reps=None):
    """See benchmarks/_timing.py (shared fetch-delta methodology)."""
    return _bench_delta(make_fn, *args,
                        reps=reps if reps is not None else globals()["REPS"],
                        warmup=warmup, iters=iters)


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/vag_nmt_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    from vag_nmt_tpu.ops.gru import bidirectional_gru, init_gru_params

    backend = jax.default_backend()
    impls = ["xla", "pallas"]
    shapes = [(64, 16), (128, 16), (64, 32), (128, 32)]
    E, H = 256, 512
    dtypes = ["float32", "bfloat16"]

    pf = init_gru_params(jax.random.key(0), E, H)
    pb = init_gru_params(jax.random.key(1), E, H)

    rows = []
    for B, T in shapes:
        rng = np.random.RandomState(0)
        x32 = rng.randn(B, T, E).astype(np.float32)
        lens = rng.randint(T // 2, T + 1, B)
        mask = (np.arange(T)[None] < lens[:, None]).astype(np.float32)
        for dt in dtypes:
            x = jnp.asarray(x32, jnp.bfloat16 if dt == "bfloat16" else
                            jnp.float32)
            p_f = jax.tree.map(lambda a: a.astype(x.dtype), pf)
            p_b = jax.tree.map(lambda a: a.astype(x.dtype), pb)
            for impl in impls:
                # Chain REPS data-dependent iterations in one dispatch: the
                # next input depends on the previous result, so nothing can
                # be hoisted or elided, and the grads feed the carry so the
                # backward can't be DCE'd.
                def loss(xx, a, b, m, im=impl):
                    out, hf, hb = bidirectional_gru(a, b, xx, m, impl=im)
                    return jnp.sum(out.astype(jnp.float32))

                grad_all = jax.grad(loss, argnums=(0, 1, 2))

                def make_fwd(n, a=p_f, b=p_b, im=impl):
                    @jax.jit
                    def fwd(xx, m):
                        def body(i, carry):
                            y = bidirectional_gru(a, b, carry, m, impl=im)[0]
                            return (carry * 0.5
                                    + y[..., :E].astype(carry.dtype) * 0.01)
                        return jax.lax.fori_loop(0, n, body, xx)
                    return fwd

                def make_fwdbwd(n, a=p_f, b=p_b, g=grad_all):
                    @jax.jit
                    def fwdbwd(xx, m):
                        def body(i, carry):
                            dx, da, db = g(carry, a, b, m)
                            leak = (jnp.sum(da["uh"]) + jnp.sum(db["uh"])) * 1e-12
                            return (carry * 0.5 + dx.astype(carry.dtype) * 0.01
                                    + leak.astype(carry.dtype))
                        return jax.lax.fori_loop(0, n, body, xx)
                    return fwdbwd
                try:
                    t_f = bench_delta(make_fwd, x, mask, reps=REPS_FWD)
                    t_fb = bench_delta(make_fwdbwd, x, mask)
                    err = ""
                except Exception as e:  # compile failure is a RESULT here
                    t_f = t_fb = float("nan")
                    err = f"{type(e).__name__}: {e}"[:200]
                rows.append({
                    "impl": impl, "B": B, "T": T, "dtype": dt,
                    "fwd_us": round(t_f * 1e6, 1),
                    "fwdbwd_us": round(t_fb * 1e6, 1),
                    "backend": backend, "error": err,
                })
                print(json.dumps(rows[-1]), flush=True)

    # summary: pallas/xla time ratios (<1 = pallas wins)
    for B, T in shapes:
        for dt in dtypes:
            r = {x["impl"]: x for x in rows
                 if x["B"] == B and x["T"] == T and x["dtype"] == dt}
            if ("pallas" in r and "xla" in r
                    and not r["pallas"]["error"]
                    and not r["xla"]["error"]):
                print(json.dumps({
                    "summary": f"B{B}_T{T}_{dt}",
                    "pallas_over_xla_fwd":
                        round(r["pallas"]["fwd_us"] / r["xla"]["fwd_us"], 2),
                    "pallas_over_xla_fwdbwd":
                        round(r["pallas"]["fwdbwd_us"] / r["xla"]["fwdbwd_us"],
                              2),
                }), flush=True)


if __name__ == "__main__":
    main()
