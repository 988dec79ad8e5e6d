"""IKEA-scale long-caption end-to-end exercise (VERDICT r1 item 7).

Validates BASELINE config 4's regime — long noisy captions (64–128 BPE
units), 16k merges/vocab, max_len=128 — through the REAL CLI surfaces:
synthetic raw corpus -> `preprocess` (Moses tokenizer + 16k BPE merges) ->
`train` (ikea_vag preset, long buckets) -> fused beam-5 decode at
max_len=128, exercising the uint16 transport guard and the (16..128) bucket
ladder end to end. Prints one JSON line per stage; paste the decode point
into README.

Synthetic task: target = reversed source words (learnable), words are random
letter strings from 30k types so BPE has real merge structure. Run ON TPU:

    python benchmarks/ikea_exercise.py [--out /tmp/ikea_synth]
"""

from __future__ import annotations

import argparse
import json
import os
import random
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def gen_raw(root: str) -> None:
    rng = random.Random(11)
    letters = "abcdefghijklmnopqrstuvwxyzäöüß"
    types = ["".join(rng.choice(letters) for _ in range(rng.randint(3, 12)))
             for _ in range(30000)]
    os.makedirs(root, exist_ok=True)
    frng = np.random.RandomState(5)
    for split, n in (("train", 6000), ("val", 400), ("test", 1000)):
        en, de = [], []
        for _ in range(n):
            words = [rng.choice(types) for _ in range(rng.randint(40, 90))]
            en.append(" ".join(words))
            de.append(" ".join(reversed(words)))
        with open(os.path.join(root, f"{split}.en"), "w") as f:
            f.write("\n".join(en) + "\n")
        with open(os.path.join(root, f"{split}.de"), "w") as f:
            f.write("\n".join(de) + "\n")
        np.save(os.path.join(root, f"{split}_features.npy"),
                frng.randn(n, 2048).astype(np.float32))


def cli(*args: str) -> float:
    t0 = time.time()
    subprocess.run([sys.executable, "-m", "vag_nmt_tpu", *args],
                   cwd="/root/repo", check=True)
    return time.time() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/ikea_synth")
    ap.add_argument("--train-steps", type=int, default=600)
    ap.add_argument("--max-train-steps", type=int, default=4800,
                    help="cap for the train-to-EOS loop (bench.py protocol: "
                    "keep training until decode lengths reach the IKEA "
                    "regime, so the decode number reflects realistic EOS "
                    "behavior instead of every row running to max_len=128)")
    ap.add_argument("--resume-at", type=int, default=0,
                    help="resume an interrupted run: skip corpus generation, "
                    "preprocess, and the initial train stage, and enter the "
                    "train-to-EOS loop with this many steps already trained "
                    "(the checkpoint under --out/run must exist)")
    ap.add_argument("--recipe", action="store_true",
                    help="ALSO decode with the recommended long-caption "
                    "production recipe (VERDICT r4 item 5) — per-row "
                    "source-relative caps + exact admissible prune + "
                    "no-repeat n-gram ban — and emit a second "
                    "'decode_recipe' JSON next to the flat-cap number")
    ap.add_argument("--recipe-factor", type=float, default=1.5)
    ap.add_argument("--recipe-offset", type=int, default=5)
    ap.add_argument("--recipe-block", type=int, default=4)
    args = ap.parse_args()
    raw = os.path.join(args.out, "raw")
    prep = os.path.join(args.out, "prep")
    run = os.path.join(args.out, "run")

    if not args.resume_at:
        gen_raw(raw)
        dt = cli("preprocess", "--raw-dir", raw, "--out-dir", prep,
                 "--langs", "en,de", "--splits", "train,val,test",
                 "--bpe-merges", "16000")
        print(json.dumps({"stage": "preprocess", "merges": 16000,
                          "seconds": round(dt, 1)}), flush=True)

        dt = cli("train", "--preset", "ikea_vag", "--data-dir", prep,
                 "--out-dir", run, "--max-steps", str(args.train_steps),
                 "--set", "train.eval_every_steps=0")
        print(json.dumps({"stage": "train", "steps": args.train_steps,
                          "seconds": round(dt, 1)}), flush=True)

    # fused beam-5 decode at IKEA shapes, in-process for the stats dict
    try:
        import jax
        jax.config.update("jax_compilation_cache_dir", "/tmp/vag_nmt_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass
    from vag_nmt_tpu.cli import _load_split_data, _sized_cfg
    from vag_nmt_tpu.core.config import preset
    from vag_nmt_tpu.core.flops import (
        decode_step_flops,
        prepare_flops,
        roofline,
        decode_step_bytes,
    )
    from vag_nmt_tpu.decode.translate import build_img_table, translate_corpus
    from vag_nmt_tpu.evaluation.bleu import corpus_bleu
    from vag_nmt_tpu.train.checkpoint import load_checkpoint
    from vag_nmt_tpu.train.state import create_train_state

    cfg = preset("ikea_vag").replace(data=dict(data_dir=prep))
    exs, src_vocab, tgt_vocab = _load_split_data(cfg, "test")
    cfg = _sized_cfg(cfg, src_vocab, tgt_vocab)

    def load_state():
        template = create_train_state(jax.random.key(0), cfg)
        st, _ = load_checkpoint(os.path.join(run, "checkpoints"), "last",
                                template)
        return st

    state = load_state()
    tbl = build_img_table(exs, cfg.model.img_feat_dim)

    # Train-to-EOS loop (bench.py protocol; VERDICT r2 item 4): the r1/r2
    # "298 sent/s" figure was an under-trained LOWER BOUND where worst rows
    # ran all 128 steps. Keep training (checkpoint resume) until the mean
    # decoded length enters the corpus regime (targets are 40-90 words ->
    # ~45-110 BPE units incl. <eos>), so the recorded number reflects
    # realistic attention-driven EOS placement.
    steps = args.resume_at or args.train_steps
    hyps, stats = translate_corpus(state.params, cfg, exs, tgt_vocab,
                                   beam_size=5, img_table=tbl)
    ml = float(np.mean([len(h.split()) + 1 for h in hyps]))
    while not (40.0 <= ml <= 115.0) and steps < args.max_train_steps:
        steps = min(steps + 1200, args.max_train_steps)
        dt = cli("train", "--preset", "ikea_vag", "--data-dir", prep,
                 "--out-dir", run, "--max-steps", str(steps),
                 "--set", "train.eval_every_steps=0",
                 "--set", "train.resume=true")
        print(json.dumps({"stage": "train_to_eos", "steps": steps,
                          "seconds": round(dt, 1),
                          "mean_hyp_len_before": round(ml, 1)}), flush=True)
        state = load_state()
        hyps, stats = translate_corpus(state.params, cfg, exs, tgt_vocab,
                                       beam_size=5, img_table=tbl)
        ml = float(np.mean([len(h.split()) + 1 for h in hyps]))

    refs = []
    with open(os.path.join(prep, "test.de"), encoding="utf-8") as f:
        from vag_nmt_tpu.data.bpe import remove_bpe

        refs = [" ".join(remove_bpe(ln.split())) for ln in f]

    def timed_decode(stage: str, cfg_d, extra=None):
        hyps = stats = None
        for i in range(2):  # 2 timed runs (first call above/below warms)
            hyps, stats = translate_corpus(state.params, cfg_d, exs,
                                           tgt_vocab, beam_size=5,
                                           img_table=tbl)
        bleu = corpus_bleu(hyps, refs)
        m = cfg_d.model
        nb, rows, t_src = (stats["n_chunks"], stats["rows_per_chunk"],
                           stats["t_src"])
        flops = (nb * rows * prepare_flops(m, t_src)
                 + stats["beam_loop_steps"] * rows * 5
                 * decode_step_flops(m, t_src))
        byts = stats["beam_loop_steps"] * decode_step_bytes(
            m, rows * 5, t_src)
        roof = roofline(flops / stats["elapsed_s"],
                        byts / stats["elapsed_s"])
        print(json.dumps({
            "stage": stage, "beam": 5, "max_len": cfg_d.decode.max_len,
            "t_src_bucket": t_src,
            "sent_per_sec": round(stats["sentences_per_sec"], 1),
            # +1 = the <eos> step, matching bench.py's convention and this
            # script's own train-to-EOS gate (review finding: the JSON used
            # to drop the +1, printing a number below its own acceptance
            # band)
            "mean_hyp_len": round(float(np.mean(
                [len(h.split()) + 1 for h in hyps])), 1),
            "hyp_len_std": round(float(np.std(
                [len(h.split()) + 1 for h in hyps])), 1),
            "train_steps_total": steps,
            "chunk_trip_min_med_max": [
                int(np.min(stats["chunk_steps"])),
                int(np.median(stats["chunk_steps"])),
                int(np.max(stats["chunk_steps"]))],
            "bleu_after_brief_training": round(bleu.bleu, 1),
            "achieved_tflops": round(flops / stats["elapsed_s"] / 1e12, 2),
            "mfu": round(roof["mfu"], 4), "bound": roof["bound"],
            "vocab": (len(src_vocab), len(tgt_vocab)),
            **(extra or {}),
        }), flush=True)

    timed_decode("decode", cfg)

    if args.recipe:
        # The production long-caption configuration (VERDICT r4 item 5):
        # per-row source-relative caps tighten the admissible-prune bound
        # to raw/rowcap^alpha (the fairseq/marian coupling), and the
        # n-gram ban removes the degenerate repetition loops that pin
        # trips at max_len. SEMANTIC regime — caps can truncate rows and
        # the ban changes outputs by design, so BLEU is recorded next to
        # throughput rather than asserted equal.
        recipe_cfg = cfg.replace(decode=dict(
            max_len_factor=args.recipe_factor,
            max_len_offset=args.recipe_offset,
            block_ngram=args.recipe_block,
            beam_prune="on"))
        timed_decode("decode_recipe", recipe_cfg, extra={
            "max_len_factor": args.recipe_factor,
            "max_len_offset": args.recipe_offset,
            "block_ngram": args.recipe_block,
        })


if __name__ == "__main__":
    main()
