"""Full-scale Multi30k-shaped end-to-end exercise through the REAL CLI
surfaces (round-2 integration check: Moses preprocessing at corpus scale,
Pallas-encoder training, fused decode, METEOR-1.5 scoring, retrieval,
manifest-driven serving).

Synthetic learnable task at Multi30k scale (29k/1k/1k): target = reversed
source words; image features = a fixed random projection of the source
bag-of-words + noise, so visual grounding and retrieval carry real signal.

Run ON TPU:  python benchmarks/m30k_exercise.py [--out /tmp/m30k_r2]
Prints one JSON line per stage.
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
    rng = random.Random(3)
    letters = "abcdefghijklmnopqrstuvwxyz"
    types = ["".join(rng.choice(letters) for _ in range(rng.randint(3, 9)))
             for _ in range(12000)]
    proj = np.random.RandomState(0).randn(len(types), 2048).astype(np.float32)
    os.makedirs(root, exist_ok=True)
    frng = np.random.RandomState(7)
    for split, n in (("train", 29000), ("val", 1000), ("test2016", 1000),
                     ("test2017", 1000)):
        en, de, feats = [], [], np.zeros((n, 2048), np.float32)
        for i in range(n):
            L = max(4, min(24, int(rng.gauss(13, 4))))
            widx = [rng.randrange(len(types)) for _ in range(L)]
            words = [types[w] for w in widx]
            en.append(" ".join(words) + " .")
            de.append(" ".join(reversed(words)) + " .")
            feats[i] = (proj[widx].mean(0)
                        + 0.05 * frng.randn(2048).astype(np.float32))
        with open(os.path.join(root, f"{split}.en"), "w") as f:
            f.write("\n".join(en) + "\n")
        with open(os.path.join(root, f"{split}.de"), "w") as f:
            f.write("\n".join(de) + "\n")
        np.save(os.path.join(root, f"{split}_features.npy"), feats)


def cli(*args: str, capture: bool = False):
    t0 = time.time()
    r = subprocess.run([sys.executable, "-m", "vag_nmt_tpu", *args],
                       cwd="/root/repo", check=True,
                       capture_output=capture, text=True)
    return time.time() - t0, (r.stdout if capture else "")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/m30k_r2")
    ap.add_argument("--max-epochs", type=int, default=6)
    ap.add_argument("--preset", default="m30k_ende_vag",
                    help="m30k_ende_vag (config 2) or m30k_scaled (config 5:"
                         " 2-layer 512d, retrieval on test2017)")
    args = ap.parse_args()
    preset = args.preset
    # BASELINE config 5 evaluates retrieval on test2017
    retrieval_split = "test2017" if preset == "m30k_scaled" else "test2016"
    raw = os.path.join(args.out, "raw")
    prep = os.path.join(args.out, "prep")
    run = os.path.join(args.out, "run")

    gen_raw(raw)
    dt, _ = cli("preprocess", "--raw-dir", raw, "--out-dir", prep,
                "--langs", "en,de", "--splits", "train,val,test2016,test2017",
                "--bpe-merges", "10000")
    print(json.dumps({"stage": "preprocess", "seconds": round(dt, 1)}),
          flush=True)

    dt, _ = cli("train", "--preset", preset, "--data-dir", prep,
                "--out-dir", run, "--max-epochs", str(args.max_epochs))
    print(json.dumps({"stage": "train", "epochs": args.max_epochs,
                      "seconds": round(dt, 1)}), flush=True)

    hyp = os.path.join(args.out, "hyp.txt")
    dt, _ = cli("translate", "--preset", preset, "--data-dir", prep,
                "--checkpoint", run, "--tag", "best", "--split", "test2016",
                "--output", hyp)
    print(json.dumps({"stage": "translate", "seconds": round(dt, 1)}),
          flush=True)

    # translate writes de-BPE'd hypotheses (multi-bleu convention), so the
    # reference must be de-BPE'd too — scoring against the raw BPE'd split
    # file cross-compares segmentations and reads as ~1 BLEU.
    from vag_nmt_tpu.data.bpe import remove_bpe

    ref = os.path.join(args.out, "ref_debpe.de")
    with open(os.path.join(prep, "test2016.de"), encoding="utf-8") as f, \
            open(ref, "w", encoding="utf-8") as g:
        for ln in f.read().splitlines():
            g.write(" ".join(remove_bpe(ln.split())) + "\n")
    _, out = cli("score", "--hyp", hyp, "--ref", ref,
                 "--meteor", "--lang", "de", capture=True)
    print(json.dumps({"stage": "score", "out": out.strip().splitlines()[0]}),
          flush=True)

    _, out = cli("retrieval", "--preset", preset, "--data-dir", prep,
                 "--checkpoint", run, "--tag", "best", "--split", retrieval_split,
                 capture=True)
    print(json.dumps({"stage": "retrieval",
                      "out": out.strip().splitlines()[-1]}), flush=True)

    # manifest-driven serving on RAW lines (Moses tokenization replayed)
    src_lines = open(os.path.join(raw, "test2016.en")).read().splitlines()[:64]
    inp = os.path.join(args.out, "serve_in.txt")
    open(inp, "w").write("\n".join(src_lines) + "\n")
    outp = os.path.join(args.out, "serve_out.txt")
    dt, _ = cli("translate-text", "--checkpoint", run, "--data-dir", prep,
                "--input", inp, "--output", outp)
    served = open(outp).read().splitlines()
    ref_lines = open(os.path.join(raw, "test2016.de")).read().splitlines()[:64]
    # de-BPE'd tokenized output vs lowercased tokenized reference
    from vag_nmt_tpu.evaluation.bleu import corpus_bleu

    refs = [ln.lower() for ln in ref_lines]
    bleu = corpus_bleu(served, refs)
    print(json.dumps({"stage": "serve", "lines": len(served),
                      "seconds": round(dt, 1),
                      "serve_bleu_vs_ref": round(bleu.bleu, 1)}), flush=True)


if __name__ == "__main__":
    main()
