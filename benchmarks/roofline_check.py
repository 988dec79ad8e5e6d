"""Measured-counter cross-check of the analytic decode roofline (VERDICT r2
item 8): capture one jax.profiler trace of the fused beam decode, sum the
profiler's per-op device times and bytes, and compare against
core/flops.decode_step_bytes' analytic model. Run ON TPU:

    python benchmarks/roofline_check.py [--out /tmp/vag_profile]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def capture(out_dir: str):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/vag_nmt_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from vag_nmt_tpu.core.config import preset
    from vag_nmt_tpu.data.batching import Example
    from vag_nmt_tpu.data.vocab import Vocab
    from vag_nmt_tpu.decode.translate import build_img_table, translate_corpus
    from vag_nmt_tpu.models import init_params

    cfg = preset("m30k_ende_vag").replace(
        model=dict(compute_dtype="bfloat16"),
        decode=dict(beam_size=5, max_len=16, decode_batch_size=128))
    m = cfg.model
    rng = np.random.RandomState(0)
    N = 1024
    examples = [Example(
        src=list(rng.randint(4, m.src_vocab_size,
                             int(np.clip(rng.normal(13, 4), 4, 32)))),
        tgt=None, img=rng.randn(m.img_feat_dim).astype(np.float32), index=i)
        for i in range(N)]
    vocab = Vocab(["<pad>", "<unk>", "<sos>", "<eos>"]
                  + [f"t{i}" for i in range(m.tgt_vocab_size - 4)])
    params = init_params(jax.random.key(0), m)
    tbl = build_img_table(examples, m.img_feat_dim)

    # warm/compile outside the trace
    hyps, stats = translate_corpus(params, cfg, examples, vocab,
                                   img_table=tbl)
    with jax.profiler.trace(out_dir):
        t0 = time.perf_counter()
        hyps, stats = translate_corpus(params, cfg, examples, vocab,
                                       img_table=tbl)
        elapsed = time.perf_counter() - t0
    return cfg, stats, elapsed


def analyze(out_dir: str):
    """Parse the newest xplane.pb with tensorflow's profiler proto and sum
    device-stream op durations + any bytes-accessed stats."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(
        out_dir, "plugins/profile/*/*.xplane.pb")), key=os.path.getmtime)
    if not paths:
        return {"error": "no xplane.pb captured"}
    raw = open(paths[-1], "rb").read()
    try:
        raw = gzip.decompress(raw)
    except OSError:
        pass
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(raw)

    result = {"planes": []}
    for plane in xs.planes:
        stat_names = {k: v.name for k, v in plane.stat_metadata.items()}
        ev_names = {k: v.name for k, v in plane.event_metadata.items()}
        total_dur = 0
        by_op = {}
        bytes_total = 0
        n_events = 0
        # Device planes carry HIERARCHICAL lines ("XLA Modules" events span
        # and enclose the "XLA Ops" events); summing every line double-
        # counts device time once per level (review finding). Use the
        # single busiest line as the op-level accounting; the others exist
        # for grouping only.
        def line_dur(ln):
            return sum(e.duration_ps for e in ln.events)

        op_lines = [ln for ln in plane.lines if "Ops" in (ln.name or "")]
        lines = (op_lines if op_lines
                 else sorted(plane.lines, key=line_dur, reverse=True)[:1])
        for line in lines:
            for ev in line.events:
                dur = ev.duration_ps / 1e12
                name = ev_names.get(ev.metadata_id, "?")
                total_dur += dur
                n_events += 1
                key = name.split(".")[0][:40]
                by_op[key] = by_op.get(key, 0.0) + dur
                for st in ev.stats:
                    sname = stat_names.get(st.metadata_id, "")
                    if "bytes_accessed" in sname:
                        bytes_total += (st.int64_value or st.uint64_value)
        top = sorted(by_op.items(), key=lambda kv: -kv[1])[:12]
        result["planes"].append({
            "name": plane.name, "events": n_events,
            "busy_s": round(total_dur, 4),
            "bytes_accessed": int(bytes_total),
            "top_ops_s": {k: round(v, 4) for k, v in top},
        })
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/vag_profile")
    args = ap.parse_args()
    cfg, stats, elapsed = capture(args.out)
    summary = analyze(args.out)

    from vag_nmt_tpu.core.flops import decode_step_bytes

    m = cfg.model
    rows, t_src = stats["rows_per_chunk"], stats["t_src"]
    analytic = stats["beam_loop_steps"] * decode_step_bytes(
        m, rows * 5, t_src)
    print(json.dumps({
        "elapsed_s": round(elapsed, 3),
        "loop_steps": stats["beam_loop_steps"],
        "analytic_decode_bytes": int(analytic),
        "profiler": summary,
    }, indent=1))


if __name__ == "__main__":
    main()
