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

Resilience (VERDICT r4 item 1 — the round-4 score was NULLED by one
transient remote-compile HTTP error at param init that restarted the whole
protocol into the driver's timeout):

- Every device-touching stage (probe, setup, init, each train chunk, each
  timed decode) runs under a BOUNDED PER-STAGE retry (3 attempts, short
  backoff) that only re-runs the failed stage — never the whole protocol.
- Stage state is CACHED in /tmp keyed by config hash: the probe dict and
  the brief-trained params (host numpy) survive a process restart, so even
  a full re-run skips straight to the timed decodes.
- An INTERNAL wall-clock budget (env VAG_BENCH_BUDGET_S, default 900 s)
  degrades the protocol (skip probe, truncate training, fewer timed runs)
  rather than overrunning the driver's timeout; a watchdog thread emits
  the best-available JSON ~15 s before the budget expires and a SIGTERM
  handler does the same if the driver starts killing us first.
- A JSON line is ALWAYS printed, exactly once — degraded runs carry
  "degraded": true plus the reason; even a fatal error prints a valid
  (value 0.0) record instead of a bare traceback.
- Fault injection for tests: VAG_BENCH_FAULT="init:2,timed:1" raises a
  synthetic transient in the named stage that many times.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "sent/s/chip", "vs_baseline": N, ...}
"""

from __future__ import annotations

import hashlib
import json
import os
import pickle
import signal
import sys
import tempfile
import threading
import time
import traceback

import numpy as np

BASELINE_SENT_PER_SEC = 5000.0  # BASELINE.json target for beam=5 on v5e

# Protocol knobs. The driver runs with defaults; the env overrides exist for
# the CPU fault-injection tests (tiny shapes) and for on-chip knob A/Bs that
# want the full bench protocol at a different chunk size. Non-default values
# are reported in the JSON as "env_overrides" so a knob-swept run can never
# masquerade as the headline.
N_SENT = int(os.environ.get("VAG_BENCH_NSENT", 4096))
TRAIN_STEPS_MAX = int(os.environ.get("VAG_BENCH_TRAIN_MAX", 1500))
TRAIN_CHUNK = max(1, min(250, TRAIN_STEPS_MAX or 1))
TIMED_RUNS = int(os.environ.get("VAG_BENCH_RUNS", 3))
BUDGET_S = float(os.environ.get("VAG_BENCH_BUDGET_S", 900))
CACHE_DIR = os.environ.get("VAG_BENCH_CACHE_DIR", "/tmp/vag_nmt_bench_state")
CACHE_TTL_S = 6 * 3600.0
_T0 = time.monotonic()

_DEFAULTS = (N_SENT == 4096 and TRAIN_STEPS_MAX == 1500 and TIMED_RUNS == 3
             and "VAG_BENCH_CHUNK" not in os.environ
             and "VAG_BENCH_MAXLEN" not in os.environ
             and "VAG_BENCH_PRESET" not in os.environ
             and "VAG_BENCH_DECODE_DTYPE" not in os.environ)


def _remaining() -> float:
    return BUDGET_S - (time.monotonic() - _T0)


def _log(msg: str) -> None:
    print(f"[bench] +{time.monotonic() - _T0:6.1f}s {msg}",
          file=sys.stderr, flush=True)


# --- single-shot JSON emission -------------------------------------------
# RESULT is the best-available record at any instant; stages fill it in as
# they complete. emit() prints it exactly once (watchdog, SIGTERM handler,
# and the normal end-of-run all funnel here).
RESULT: dict = {
    "metric": "multi30k_ende_beam5_decode_throughput",
    "value": 0.0,
    "unit": "sent/s/chip",
    "vs_baseline": 0.0,
    "degraded": True,
    "degraded_reason": "startup",
}
_EMIT_LOCK = threading.Lock()
_EMITTED = False


def emit(**updates) -> None:
    global _EMITTED
    with _EMIT_LOCK:
        if _EMITTED:
            return
        _EMITTED = True
        RESULT.update(updates)
        if not RESULT.get("degraded"):
            RESULT.pop("degraded_reason", None)
        if not _DEFAULTS:
            RESULT["env_overrides"] = True
        print(json.dumps(RESULT), flush=True)


def _update(**kv) -> None:
    # All main-thread RESULT mutation goes through the lock so the watchdog
    # thread never serializes a dict mid-update.
    with _EMIT_LOCK:
        if not _EMITTED:
            RESULT.update(kv)


def _watchdog() -> None:
    # Emits the best-so-far record shortly before the internal budget
    # expires, then hard-exits: a hung remote compile can block the main
    # thread indefinitely, and only a separate thread can still print.
    while not _EMITTED:
        if _remaining() < 15.0:
            _log("watchdog: budget nearly exhausted, emitting partial result")
            emit(degraded=True, degraded_reason="internal_deadline")
            os._exit(0)
        time.sleep(1.0)


def _on_sigterm(signum, frame):  # pragma: no cover - driver-timeout path
    _log("SIGTERM received, emitting partial result")
    emit(degraded=True, degraded_reason="sigterm")
    os._exit(0)


# --- bounded per-stage retries + fault injection --------------------------
class _InjectedFault(Exception):
    """Synthetic transient raised by VAG_BENCH_FAULT (tests only)."""


def _parse_faults() -> dict:
    out = {}
    for part in os.environ.get("VAG_BENCH_FAULT", "").split(","):
        if ":" in part:
            stage, n = part.split(":", 1)
            out[stage.strip()] = int(n)
    return out


_FAULTS = _parse_faults()


def _transient(e: Exception) -> bool:
    # The tunneled backend throws JaxRuntimeError/XlaRuntimeError for flaky
    # RPC reads (observed r4: remote-compile "response body closed");
    # deterministic failures (config errors, assertions) are NOT retried.
    return (isinstance(e, _InjectedFault)
            or type(e).__name__ in ("JaxRuntimeError", "XlaRuntimeError"))


def attempt(stage: str, fn, tries: int = 3, backoff: float = 2.0):
    """Run fn() with a bounded retry on transient backend errors.

    Scope is ONE stage: a retry re-runs only this fn, never earlier stages
    (their results are already in host memory / the /tmp cache)."""
    for i in range(tries):
        try:
            if _FAULTS.get(stage, 0) > 0:
                _FAULTS[stage] -= 1
                raise _InjectedFault(f"injected fault in stage {stage!r}")
            return fn()
        except Exception as e:
            if not _transient(e) or i == tries - 1:
                raise
            wait = min(backoff * (i + 1), max(_remaining() - 30.0, 0.0))
            _log(f"stage={stage} transient {type(e).__name__} "
                 f"(attempt {i + 1}/{tries}): {e}; retrying in {wait:.1f}s")
            if wait > 0:
                time.sleep(wait)


# --- /tmp stage cache -----------------------------------------------------
def _cache_path(name: str) -> str:
    os.makedirs(CACHE_DIR, exist_ok=True)
    return os.path.join(CACHE_DIR, name)


def _cache_load(name: str):
    path = _cache_path(name)
    try:
        if time.time() - os.path.getmtime(path) > CACHE_TTL_S:
            return None
        with open(path, "rb") as f:
            return pickle.load(f)
    except Exception:
        return None


def _cache_store(name: str, obj) -> None:
    try:
        path = _cache_path(name)
        fd, tmp = tempfile.mkstemp(dir=CACHE_DIR)
        with os.fdopen(fd, "wb") as f:
            pickle.dump(obj, f)
        os.replace(tmp, path)  # atomic: a killed run never leaves half a file
    except Exception as e:  # cache is an optimization, never fatal
        _log(f"cache store {name} failed: {e}")


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

    # Rep count is env-tunable: the CPU harness tests set 1 (a 600-matmul
    # chain on a CPU backend takes minutes and calibrates nothing).
    r = int(os.environ.get("VAG_BENCH_PROBE_REPS", 200))
    kern = max(chain(3 * r) - chain(r), 0.0) / (2 * r)

    # rtt times a put AND a get of 4 bytes; each bandwidth measurement is
    # one-way (put+ack, or fetch), so it carries ~half that latency. A
    # transfer time at or below the latency estimate means the measurement
    # is meaningless — report null + probe_invalid, not a clamped huge
    # number (ADVICE r4).
    def bw(t):
        d = t - rtt / 2
        return round(mb / d, 1) if d > 1e-6 else None

    out = {
        "rtt_ms": round(rtt * 1e3, 2),
        "h2d_mb_s": bw(h2d),
        "d2h_mb_s": bw(d2h),
        "kernel_ms": round(kern * 1e3, 3),
    }
    if out["h2d_mb_s"] is None or out["d2h_mb_s"] is None:
        out["probe_invalid"] = True
    return out


def main() -> None:
    threading.Thread(target=_watchdog, daemon=True).start()
    try:
        signal.signal(signal.SIGTERM, _on_sigterm)
    except ValueError:  # non-main thread (not expected; belt and braces)
        pass

    import jax

    if os.environ.get("VAG_BENCH_FORCE_CPU"):  # tests only
        jax.config.update("jax_platforms", "cpu")

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
    from vag_nmt_tpu.models import init_params
    from vag_nmt_tpu.train.state import create_train_state
    from vag_nmt_tpu.train.step import make_train_step

    cfg = preset(os.environ.get("VAG_BENCH_PRESET", "m30k_ende_vag"))
    # decode_batch_size=128 and beam_unroll=1 re-confirmed under the
    # round-4 depth-K kernel (r5 sweep, decode_knob_sweep.py, U x chunk
    # cross grid {1,2,4} x {48,64,96,128}, interleaved legs, medians):
    # chunk 64 (21.5k) and 128 (21.4k at U1, 21.8k at U2) are a
    # statistical tie (ranges overlap ~2k wide), 48 (20.7k) and 96
    # (19.9k) lose; U=2 is noise-level everywhere (+-2%, sign flips by
    # chunk) and U=4 consistently loses 3-7%. Full table in
    # docs/usage.md.
    # VAG_BENCH_DTYPE A/Bs the MODEL/train compute dtype (bf16 default —
    # the Pallas train kernels' win regime). The DECODE side runs fp32 by
    # default since r5 (decode.compute_dtype, core/config.py): the
    # same-checkpoint interleaved e2e A/B measured fp32 decode +4.4%
    # median (19.6k vs 18.8k, 6/7 reps) on the latency-bound loop;
    # VAG_BENCH_DECODE_DTYPE=bfloat16 restores the bf16 decode leg.
    dtype = os.environ.get("VAG_BENCH_DTYPE", "bfloat16")
    cfg = cfg.replace(
        model=dict(compute_dtype=dtype),
        decode=dict(beam_size=5,
                    max_len=int(os.environ.get("VAG_BENCH_MAXLEN", 64)),
                    decode_batch_size=int(
                        os.environ.get("VAG_BENCH_CHUNK", 128)),
                    compute_dtype=os.environ.get(
                        "VAG_BENCH_DECODE_DTYPE", "float32")),
        data=dict(batch_size=64))
    m = cfg.model
    cfg_key = hashlib.sha256(
        (json.dumps(cfg.to_dict(), sort_keys=True)
         + f"|protocol-v1|{TRAIN_STEPS_MAX}").encode()).hexdigest()[:16]

    # --- probe (cached; diagnostic only — its failure never blocks) -------
    probe = _cache_load("probe.pkl")
    if probe is not None:
        _log("stage=probe cache hit")
        probe = dict(probe, cached=True)
    elif _remaining() > 0.5 * BUDGET_S:
        _log("stage=probe")
        try:
            probe = attempt("probe", link_probe, tries=2)
            _cache_store("probe.pkl", probe)
        except Exception as e:
            _log(f"probe failed, continuing without: {e}")
            probe = {"probe_invalid": True, "error": type(e).__name__}
    else:
        probe = {"probe_invalid": True, "error": "skipped_for_budget"}
    _update(probe=probe)

    # --- host-side corpus construction (deterministic, no device) ---------
    _log("stage=setup")
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
    train_exs = make_examples(min(2048, max(N_SENT, 64)), 13, 15,
                              with_tgt=True)
    vocab = Vocab(["<pad>", "<unk>", "<sos>", "<eos>"]
                  + [f"t{i}" for i in range(m.tgt_vocab_size - 4)])
    img_table = attempt("setup", lambda: build_img_table(
        examples, m.img_feat_dim))

    def mean_len(hyps) -> float:
        # emitted units + the <eos> step (stripped from the text output)
        return float(np.mean([len(h.split()) + 1 for h in hyps]))

    # --- brief on-chip training to a realistic decode-length regime -------
    # Cached across restarts: a re-run after a crash (or the retry of a
    # later stage's process) loads host-numpy params and skips straight to
    # the timed decodes.
    params = None
    ml, steps_done = 65.0, 0
    cached = _cache_load(f"params_{cfg_key}.pkl")
    if cached is not None:
        try:
            want = jax.eval_shape(
                lambda k: init_params(k, cfg.model), jax.random.key(0))
            got = cached["params"]
            ok = (jax.tree_util.tree_structure(want)
                  == jax.tree_util.tree_structure(got))
            ok = ok and all(
                w.shape == np.shape(g) for w, g in zip(
                    jax.tree_util.tree_leaves(want),
                    jax.tree_util.tree_leaves(got)))
            if ok:
                # One upload now; the timed decodes must see DEVICE-resident
                # params (numpy params re-upload ~35 MB per dispatch on the
                # ~25 MB/s tunnel — measured 10x on the headline).
                params = attempt("init", lambda: jax.device_put(got))
                ml = cached["mean_len"]
                steps_done = cached["steps_done"]
                _log(f"stage=train cache hit (steps={steps_done}, "
                     f"mean_len={ml:.2f})")
        except Exception as e:
            _log(f"params cache invalid, retraining: {e}")
            params = None

    train_truncated = False
    if params is None:
        _log("stage=init")
        state = attempt("init", lambda: create_train_state(
            jax.random.key(0), cfg))
        batcher = BucketBatcher(train_exs, cfg.data.batch_size,
                                cfg.data.length_buckets, include_image=True,
                                img_dim=m.img_feat_dim)
        step_fn, _ = make_train_step(cfg)
        step_rng = jax.random.key(1)
        epoch = 0

        def train_chunk(state, epoch, todo):
            # One retryable unit: a transient here re-runs at most
            # TRAIN_CHUNK steps, never the whole protocol.
            while todo > 0:
                for batch in batcher.epoch(epoch):
                    state, _ = step_fn(state, batch, step_rng)
                    todo -= 1
                    if todo <= 0:
                        break
                epoch += 1
            jax.block_until_ready(state.params)
            return state, epoch

        _log("stage=train")
        while steps_done < TRAIN_STEPS_MAX:
            # Reserve the back half of the budget for decode compile + the
            # timed runs; a shorter-trained model degrades realism, not
            # validity, and the JSON says so.
            if _remaining() < 0.5 * BUDGET_S and steps_done > 0:
                train_truncated = True
                _log("stage=train truncated for budget")
                break
            state, epoch = attempt(
                "train", lambda s=state, e=epoch: train_chunk(
                    s, e, TRAIN_CHUNK))
            steps_done += TRAIN_CHUNK
            hyps, _ = attempt("train_probe_decode", lambda: translate_corpus(
                state.params, cfg, examples, vocab, img_table=img_table))
            ml = mean_len(hyps)
            _log(f"stage=train steps={steps_done} mean_len={ml:.2f}")
            if 6.0 <= ml <= 24.0:
                break

        params = state.params          # device-resident for the timed runs
        _cache_store(f"params_{cfg_key}.pkl", {
            "params": jax.device_get(state.params), "mean_len": ml,
            "steps_done": steps_done})

    _update(beam_size=5, train_steps_for_eos=steps_done,
            n_sentences=N_SENT, compute_dtype=dtype)
    if train_truncated:
        _update(train_truncated=True)

    # --- timed runs -------------------------------------------------------
    # Headline value is the MEDIAN of the completed runs (target 3; fewer
    # only when the budget forces it, flagged as degraded), with the full
    # min..max range alongside.
    times, stats, hyps = [], None, None

    # Test hook: simulate a hang here so the watchdog/SIGTERM tests are
    # deterministic (the real hang risk — a stuck remote compile — can't be
    # triggered on demand).
    hang = float(os.environ.get("VAG_BENCH_HANG_BEFORE_TIMED", 0))
    if hang:
        _log(f"hang hook: sleeping {hang:.0f}s before timed runs")
        time.sleep(hang)

    def timed_run():
        t0 = time.perf_counter()
        h, s = translate_corpus(params, cfg, examples, vocab,
                                img_table=img_table)
        return time.perf_counter() - t0, h, s

    # Untimed warmup: on the params-cache-hit path nothing has compiled the
    # fused decode program in THIS process yet (the train loop's probe
    # decodes used to do it implicitly), and a compile inside timed run 1
    # poisons the reported range (measured: 38 vs 23.6k sent/s legs).
    _log("stage=warmup_decode")
    attempt("warmup_decode", timed_run)

    for i in range(TIMED_RUNS):
        if times and _remaining() < 1.5 * max(times) + 30.0:
            break
        _log(f"stage=timed run={i + 1}")
        t, hyps, stats = attempt("timed", timed_run)
        times.append(t)
        runs = sorted(N_SENT / x for x in times)
        value = runs[len(runs) // 2]
        # Update the shared record after EVERY completed run so the
        # watchdog/SIGTERM paths always report the best available number.
        _update(
            value=round(value, 1),
            vs_baseline=round(value / BASELINE_SENT_PER_SEC, 3),
            range_sent_per_sec=[round(runs[0], 1), round(runs[-1], 1)],
            timed_runs=len(times),
            degraded=len(times) < TIMED_RUNS or train_truncated,
            degraded_reason=("partial_timed_runs" if len(times)
                             < TIMED_RUNS else "train_truncated"),
        )

    if not times:
        emit(degraded=True, degraded_reason="no_timed_runs_completed")
        return

    ml = mean_len(hyps)

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

    elapsed_med = sorted(times)[len(times) // 2]
    nb, rows, t_src = stats["n_chunks"], stats["rows_per_chunk"], stats["t_src"]
    loop_steps = stats["beam_loop_steps"]
    beam = stats["beam_size"]
    total_flops = (nb * rows * prepare_flops(m, t_src)
                   + loop_steps * rows * beam * decode_step_flops(m, t_src))
    total_bytes = loop_steps * decode_step_bytes(m, rows * beam, t_src)
    roof = roofline(total_flops / elapsed_med, total_bytes / elapsed_med)

    emit(
        mean_hyp_len=round(ml, 2),
        # Realism transparency (VERDICT r2 weak #4): hypothesis-length
        # SPREAD and the realized per-chunk while_loop trip counts — a
        # copy-task model with matching mean but collapsed variance would
        # overstate early-exit benefits vs a converged NMT posterior.
        hyp_len_std=round(float(np.std(
            [len(h.split()) + 1 for h in hyps])), 2),
        chunk_trip_min_med_max=[
            int(np.min(stats["chunk_steps"])),
            int(np.median(stats["chunk_steps"])),
            int(np.max(stats["chunk_steps"]))],
        achieved_tflops=round(total_flops / elapsed_med / 1e12, 2),
        mfu=round(roof["mfu"], 4),
        mfu_peak_tflops=V5E_PEAK_BF16_FLOPS / 1e12,
        hbm_util_est=round(roof["hbm_util"], 4),
        bound=roof["bound"],
        gflop_per_sentence=round(total_flops / (nb * rows) / 1e9, 3),
        degraded=len(times) < TIMED_RUNS or train_truncated,
        degraded_reason=("partial_timed_runs" if len(times) < TIMED_RUNS
                         else "train_truncated"),
    )


if __name__ == "__main__":
    try:
        main()
    except BaseException as e:  # pragma: no cover - last-resort backstop
        # Per-stage retries already absorbed transient flakes; whatever
        # reaches here is fatal — but the scoreboard still gets a valid
        # (degraded) JSON line instead of a bare traceback (VERDICT r4:
        # "nothing printed" nulled the round).
        traceback.print_exc()
        emit(degraded=True,
             degraded_reason=f"fatal:{type(e).__name__}: {e}"[:300])
        if isinstance(e, KeyboardInterrupt):
            raise
