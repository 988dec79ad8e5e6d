"""Headline benchmark: beam-5 batched decode throughput (sentences/sec/chip)
on the flagship VAG-NMT EN→DE config, Multi30k-like shapes (BASELINE.json
north-star: ≥5,000 sent/s/chip at beam=5 on v5e).

Protocol (all on-device, production code paths):

1. 4096 synthetic Multi30k-shaped sentences: source length ~ N(13,4) clipped
   to [4,32] BPE units, vocab 8000, 2048-d image features.
2. The flagship multimodal model is BRIEFLY TRAINED on-chip on a copy task
   (target = source tokens, same length) until dev decode lengths reach the
   Multi30k regime. A randomly-initialized model never emits <eos> (every
   hypothesis runs to max_len) or always emits it immediately if biased —
   neither resembles production decoding. A briefly-trained model places
   <eos> from attention on the exhausted source, so hypothesis lengths vary
   per sentence exactly like a converged translation model's.
3. Timed: MEDIAN of 3 full-corpus beam-5 decodes through `translate_corpus`
   (fused single-dispatch lax.map over fixed chunks, bf16 compute, image
   features device-resident), with the min..max range alongside. Reported
   JSON includes the realized mean hypothesis length for transparency.
4. Session calibration probe (VERDICT r3 item 4): link RTT, host<->device
   bandwidth, and one fixed reference-kernel time are measured and recorded
   in the JSON, so cross-session drift in the headline decomposes into
   infra (tunnel quality) vs code. The probe runs BEFORE the timed decodes
   and touches none of their state.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "sent/s/chip", "vs_baseline": N, ...}
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

BASELINE_SENT_PER_SEC = 5000.0  # BASELINE.json target for beam=5 on v5e
N_SENT = 4096
TRAIN_STEPS_MAX = 1500
TRAIN_CHUNK = 250               # steps between length probes


def link_probe() -> dict:
    """Session link-quality calibration (VERDICT r3 item 4).

    Three fixed measurements, medians over repeats, recorded in the bench
    JSON so the headline's cross-session +-20% drift can be attributed
    after the fact:

    - rtt_ms: round-trip of a 4-byte device_put + device_get (dispatch +
      fetch latency floor on the tunneled chip; ~30 ms observed r1-r3).
    - h2d_mb_s / d2h_mb_s: 8 MiB transfer bandwidth each way (the corpus
      upload and result fetch ride this; ~13 MB/s observed on the tunnel).
    - kernel_ms: one fixed 2048x2048 bf16 matmul's device time, measured
      as the difference of two jitted matmul CHAINS (3R vs R reps, so the
      per-dispatch tunnel RTT cancels exactly — see the comment at the
      measurement). ~17.2 GFLOP per kernel. Pure device time: a drifted
      kernel_ms means the CHIP (or XLA version) changed, while drifted
      rtt/bandwidth with stable kernel_ms means the TUNNEL changed.
    """
    import jax
    import jax.numpy as jnp

    def med(f, n=5):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            f()
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[n // 2]

    tiny = np.zeros(1, np.float32)
    rtt = med(lambda: np.asarray(jax.device_get(jax.device_put(tiny))))

    mb = 8.0
    buf = np.random.RandomState(0).randn(int(mb * 1024 * 1024 // 4)) \
        .astype(np.float32)
    h2d = med(lambda: jax.device_put(buf).block_until_ready(), n=3)
    # jax.Array caches its host copy after the first fetch, so each rep
    # must fetch a FRESH device array (uploaded outside the timed window).
    devs = [jax.device_put(buf).block_until_ready() for _ in range(3)]
    it = iter(devs)
    d2h = med(lambda: np.asarray(jax.device_get(next(it))), n=3)

    # One dispatch pays the tunnel RTT (~rtt_ms), so a single matmul would
    # time the LINK, not the chip — and subtracting rtt drowns a ~1 ms
    # kernel chain in RTT jitter. Instead time chains of R and 3R matmuls
    # and difference them: the dispatch cost cancels exactly and the delta
    # is 2R kernels of pure device time.
    x = jnp.ones((2048, 2048), jnp.bfloat16)

    def chain(reps):
        f = jax.jit(lambda a: jax.lax.fori_loop(
            0, reps, lambda i, y: a @ y, a))
        f(x).block_until_ready()                    # compile outside timing
        return med(lambda: f(x).block_until_ready(), n=5)

    r = 200
    kern = max(chain(3 * r) - chain(r), 0.0) / (2 * r)

    # rtt times a put AND a get of 4 bytes; each bandwidth measurement is
    # one-way (put+ack, or fetch), so it carries ~half that latency — the
    # earlier full-rtt subtraction overstated both bandwidths by a few
    # percent at current link speeds, and worse on a faster link.
    return {
        "rtt_ms": round(rtt * 1e3, 2),
        "h2d_mb_s": round(mb / max(h2d - rtt / 2, 1e-9), 1),
        "d2h_mb_s": round(mb / max(d2h - rtt / 2, 1e-9), 1),
        "kernel_ms": round(kern * 1e3, 3),
    }


def main() -> None:
    import jax

    # Persistent compilation cache: the fused decode program takes minutes to
    # compile cold on the tunneled chip but is stable across runs.
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/vag_nmt_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    from vag_nmt_tpu.core.config import preset
    from vag_nmt_tpu.data.batching import BucketBatcher, Example
    from vag_nmt_tpu.data.vocab import Vocab
    from vag_nmt_tpu.decode.translate import build_img_table, translate_corpus
    from vag_nmt_tpu.train.state import create_train_state
    from vag_nmt_tpu.train.step import make_train_step

    probe = link_probe()

    cfg = preset("m30k_ende_vag")
    # decode_batch_size=128 measured best on v5e: chunks exit their beam
    # while_loop at the chunk's own max hypothesis length, and smaller
    # (length-sorted) chunks finish sooner; below 128 per-chunk fixed cost
    # dominates (128: ~12.5k, 256: ~9.9k, 64: ~10.4k sent/s).
    # beam_unroll stays 1: U=4 won on the pre-packed-IO kernel (-43us/step)
    # but LOSES with the slots-3 watermark kernel in the loop (348 vs 243 ms
    # at 640 steps — the unrolled body's 4 cond+kernel pairs schedule worse
    # than 4 separate iterations; /tmp combo A/B 2026-08-17).
    # VAG_BENCH_DTYPE=float32 A/Bs the whole pipeline's compute dtype (the
    # decode-step microbench found the XLA step FASTER under fp32 params at
    # latency-bound shapes — dec_step_bench.py side finding, round 4).
    dtype = os.environ.get("VAG_BENCH_DTYPE", "bfloat16")
    cfg = cfg.replace(model=dict(compute_dtype=dtype),
                      decode=dict(beam_size=5, max_len=64,
                                  decode_batch_size=128),
                      data=dict(batch_size=64))
    m = cfg.model
    rng = np.random.RandomState(0)

    def make_examples(n, lo, hi, with_tgt):
        out = []
        for i in range(n):
            L = int(np.clip(rng.normal(13, 4), lo, hi))
            src = list(rng.randint(4, m.src_vocab_size, L))
            out.append(Example(
                src=src,
                tgt=list(src) if with_tgt else None,
                img=rng.randn(m.img_feat_dim).astype(np.float32),
                index=i,
            ))
        return out

    # Decode corpus: full Multi30k length range. Train corpus: lengths
    # 13..15 so src bucket = 16 and tgt_in (len+1 <= 16) bucket = 16 — ONE
    # batch shape, ONE train-step compile; the copy task's <eos> placement
    # generalizes across lengths via attention.
    examples = make_examples(N_SENT, 4, 32, with_tgt=False)
    train_exs = make_examples(2048, 13, 15, with_tgt=True)
    vocab = Vocab(["<pad>", "<unk>", "<sos>", "<eos>"]
                  + [f"t{i}" for i in range(m.tgt_vocab_size - 4)])
    img_table = build_img_table(examples, m.img_feat_dim)

    # --- brief on-chip training to a realistic decode-length regime -------
    state = create_train_state(jax.random.key(0), cfg)
    batcher = BucketBatcher(train_exs, cfg.data.batch_size,
                            cfg.data.length_buckets, include_image=True,
                            img_dim=m.img_feat_dim)
    step_fn, _ = make_train_step(cfg)
    step_rng = jax.random.key(1)

    def mean_len(hyps) -> float:
        # emitted units + the <eos> step (stripped from the text output)
        return float(np.mean([len(h.split()) + 1 for h in hyps]))

    ml, steps_done, epoch = 65.0, 0, 0
    while steps_done < TRAIN_STEPS_MAX:
        todo = TRAIN_CHUNK
        while todo > 0:
            for batch in batcher.epoch(epoch):
                state, _ = step_fn(state, batch, step_rng)
                todo -= 1
                steps_done += 1
                if todo <= 0:
                    break
            epoch += 1
        hyps, _ = translate_corpus(state.params, cfg, examples, vocab,
                                   img_table=img_table)
        ml = mean_len(hyps)
        if 6.0 <= ml <= 24.0:
            break

    params = state.params

    # --- timed runs -------------------------------------------------------
    # Headline value is the MEDIAN of 3 runs (matches the README's range-based
    # reporting convention; a best-of-N single number overstates sustained
    # throughput), with the full min..max range alongside.
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        hyps, stats = translate_corpus(params, cfg, examples, vocab,
                                       img_table=img_table)
        times.append(time.perf_counter() - t0)
    ml = mean_len(hyps)

    runs = sorted(N_SENT / t for t in times)   # ascending sent/s
    value = runs[1]

    # --- MFU / roofline (VERDICT r1 item 2; core/flops.py) ----------------
    # FLOPs from the REALIZED beam while_loop trip counts (stats), not
    # max_len; HBM bytes assume the bf16 weight set streams once per decode
    # step (sequential loop, no cross-step reuse) + per-row ctx/ctx_proj.
    from vag_nmt_tpu.core.flops import (
        V5E_PEAK_BF16_FLOPS,
        decode_step_bytes,
        decode_step_flops,
        prepare_flops,
        roofline,
    )

    elapsed_med = sorted(times)[1]
    nb, rows, t_src = stats["n_chunks"], stats["rows_per_chunk"], stats["t_src"]
    loop_steps = stats["beam_loop_steps"]
    beam = stats["beam_size"]
    total_flops = (nb * rows * prepare_flops(m, t_src)
                   + loop_steps * rows * beam * decode_step_flops(m, t_src))
    total_bytes = loop_steps * decode_step_bytes(m, rows * beam, t_src)
    roof = roofline(total_flops / elapsed_med, total_bytes / elapsed_med)

    print(json.dumps({
        "metric": "multi30k_ende_beam5_decode_throughput",
        "value": round(value, 1),
        "unit": "sent/s/chip",
        "vs_baseline": round(value / BASELINE_SENT_PER_SEC, 3),
        "range_sent_per_sec": [round(runs[0], 1), round(runs[-1], 1)],
        "beam_size": 5,
        "mean_hyp_len": round(ml, 2),
        # Realism transparency (VERDICT r2 weak #4): hypothesis-length
        # SPREAD and the realized per-chunk while_loop trip counts — a
        # copy-task model with matching mean but collapsed variance would
        # overstate early-exit benefits vs a converged NMT posterior.
        "hyp_len_std": round(float(np.std(
            [len(h.split()) + 1 for h in hyps])), 2),
        "chunk_trip_min_med_max": [
            int(np.min(stats["chunk_steps"])),
            int(np.median(stats["chunk_steps"])),
            int(np.max(stats["chunk_steps"]))],
        "train_steps_for_eos": steps_done,
        "n_sentences": N_SENT,
        "probe": probe,
        "compute_dtype": dtype,
        "achieved_tflops": round(total_flops / elapsed_med / 1e12, 2),
        "mfu": round(roof["mfu"], 4),
        "mfu_peak_tflops": V5E_PEAK_BF16_FLOPS / 1e12,
        "hbm_util_est": round(roof["hbm_util"], 4),
        "bound": roof["bound"],
        "gflop_per_sentence": round(total_flops / (nb * rows) / 1e9, 3),
    }))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:   # pragma: no cover
        # The tunneled backend occasionally throws transient RUNTIME errors
        # (observed: FAILED_PRECONDITION on a fetch that succeeded on
        # rerun); one retry keeps a flake from zeroing out a scoring run.
        # Deterministic failures (config errors, assertions) re-raise
        # immediately rather than re-running minutes of warm-up.
        if type(e).__name__ not in ("JaxRuntimeError", "XlaRuntimeError"):
            raise
        import sys
        import traceback

        traceback.print_exc()
        print(f"retrying once after transient error: {type(e).__name__}",
              file=sys.stderr)
        main()
