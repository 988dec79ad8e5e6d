"""Train-feed overlap A/B on the REAL chip (VERDICT r3 item 3).

README's completion ladder has the packed K=8-step feed at ~6.6 ms/step vs
~1.9-2.1 ms/step pure execution; the residual is host->device transfer
latency (~30 ms round trip per upload on the tunneled chip, one upload per
K-step stack -> ~3.5 ms/step at K=8). The open question: does the NEXT
stack's upload overlap the CURRENT stack's compute, or does the tunnel
serialize them (decode's per-chunk pipelining measured NEGATIVE, but that
was 16 dispatch enqueues; train is ONE upload per 8 steps)?

This harness drives the PRODUCTION single-device packed path
(data/packing.pack_batch -> device_prefetch -> train.step.make_packed_step)
over S synthetic K-stacks at flagship m30k shapes and times the COMPLETION
of the whole stream (one final param fetch fences everything; per-stack
fetches would add round trips that are not in the production loop), under:

  sync        device_prefetch(size=0): no lookahead — upload N enqueues
              after dispatch N-1
  prefetch2   size=2 (the production default)
  prefetch4   size=4
  staged      every buffer pre-uploaded before the clock starts — the
              upload-free upper bound (dispatch + execution only)

Variants run INTERLEAVED per iteration so tunnel drift hits all equally;
medians over --iters. Run ON TPU:  python benchmarks/feed_ab.py
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np


def make_stacks(cfg, S, K, B, T, Tt, seed=0):
    """S synthetic K-stacked COMPACT batches (the production train feed
    layout: uint16 tokens + lengths + img_ids; see data/batching.py)."""
    rng = np.random.RandomState(seed)
    m = cfg.model
    stacks = []
    for _ in range(S):
        st = {
            "src": rng.randint(4, m.src_vocab_size, (K, B, T))
            .astype(np.uint16),
            "src_len": rng.randint(max(2, T // 2), T + 1, (K, B))
            .astype(np.int32),
            "tgt": rng.randint(4, m.tgt_vocab_size, (K, B, Tt))
            .astype(np.uint16),
            "tgt_len": rng.randint(1, Tt - 1, (K, B)).astype(np.int32),
            "sample_mask": np.ones((K, B), np.float32),
        }
        if m.multimodal:
            st["img_ids"] = rng.randint(0, B, (K, B)).astype(np.int32)
        stacks.append(st)
    return stacks


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="m30k_ende_vag")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--t-src", type=int, default=17)
    ap.add_argument("--t-tgt", type=int, default=17)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--stacks", type=int, default=24)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/vag_nmt_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    from vag_nmt_tpu.core.config import preset
    from vag_nmt_tpu.data.packing import pack_batch
    from vag_nmt_tpu.data.prefetch import device_prefetch
    from vag_nmt_tpu.train.state import create_train_state
    from vag_nmt_tpu.train.step import make_packed_step

    cfg = preset(args.preset).replace(
        model=dict(compute_dtype="bfloat16"),
        data=dict(batch_size=args.batch))
    m = cfg.model
    S, K, B, T, Tt = args.stacks, args.k, args.batch, args.t_src, args.t_tgt
    stacks = make_stacks(cfg, S, K, B, T, Tt)
    img_table = (jax.device_put(
        np.random.RandomState(1).randn(B, m.img_feat_dim)
        .astype(np.float32)) if m.multimodal else None)
    p_multi = make_packed_step(cfg, with_img_table=m.multimodal, multi=True)
    base_rng = jax.random.key(1)

    def fresh_state():
        return jax.device_put(create_train_state(jax.random.key(0), cfg))

    def consume(state, buf, spec):
        if m.multimodal:
            state, _ = p_multi(state, buf, base_rng, img_table, spec=spec)
        else:
            state, _ = p_multi(state, buf, base_rng, spec=spec)
        return state

    def run_prefetch(size):
        def go():
            state = fresh_state()
            specs = []

            def it():
                for b in stacks:
                    buf, spec = pack_batch(b)
                    specs.append(spec)
                    yield buf

            t0 = time.perf_counter()
            for buf in device_prefetch(it(), size=size):
                state = consume(state, buf, specs.pop(0))
            np.asarray(state.params["decoder"]["readout"]["b"][0])
            return time.perf_counter() - t0
        return go

    def run_staged():
        packed = [pack_batch(b) for b in stacks]
        spec = packed[0][1]
        bufs = [jax.device_put(b) for b, _ in packed]
        np.asarray(bufs[-1][:1])          # fence the uploads

        def go():
            state = fresh_state()
            t0 = time.perf_counter()
            for buf in bufs:
                state = consume(state, buf, spec)
            np.asarray(state.params["decoder"]["readout"]["b"][0])
            return time.perf_counter() - t0
        return go

    variants = [
        ("sync", run_prefetch(0)),
        ("prefetch2", run_prefetch(2)),
        ("prefetch4", run_prefetch(4)),
        ("staged", run_staged()),
    ]
    for _, go in variants:                 # compile + warm everything
        go()
    times = {name: [] for name, _ in variants}
    for _ in range(args.iters):            # interleaved against drift
        for name, go in variants:
            times[name].append(go())
    n_steps = S * K
    out = {"preset": args.preset, "k": K, "stacks": S, "batch": B,
           "t_src": T, "t_tgt": Tt, "steps": n_steps}
    for name, ts in times.items():
        med = sorted(ts)[len(ts) // 2]
        out[name + "_ms_per_step"] = round(med * 1e3 / n_steps, 3)
        out[name + "_range_ms"] = [round(min(ts) * 1e3 / n_steps, 3),
                                   round(max(ts) * 1e3 / n_steps, 3)]
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
