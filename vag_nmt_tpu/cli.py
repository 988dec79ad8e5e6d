"""Public CLI: the reference's train/translate/score surface (SURVEY.md §7
step 8; BASELINE.json north-star "public train/translate/score API") plus
preprocess / retrieval / make-toy utilities.

    python -m vag_nmt_tpu preprocess --raw-dir R --out-dir D --langs en,de
    python -m vag_nmt_tpu train      --preset m30k_ende_vag --data-dir D --out-dir O
    python -m vag_nmt_tpu translate  --preset ... --data-dir D --checkpoint O \
                                     --split test2016 --output hyp.txt
    python -m vag_nmt_tpu score      --hyp hyp.txt --ref ref.txt [--meteor --lang de]
    python -m vag_nmt_tpu retrieval  --preset m30k_scaled --data-dir D --checkpoint O
    python -m vag_nmt_tpu make-toy   --out-dir D

The reference drives each language pair with a duplicated argparse script;
here one CLI + preset + dotted overrides (--set model.emb_dim=512) covers all
five BASELINE configs."""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Any, Dict, List, Optional, Sequence


def _parse_overrides(pairs: Sequence[str]) -> Dict[str, Dict[str, Any]]:
    """['model.emb_dim=512', 'train.seed=7'] -> {'model': {'emb_dim': 512}}"""
    out: Dict[str, Dict[str, Any]] = {}
    for p in pairs:
        if "=" not in p or "." not in p.split("=", 1)[0]:
            raise SystemExit(f"--set expects section.key=value, got {p!r}")
        key, val = p.split("=", 1)
        section, name = key.split(".", 1)
        try:
            val = json.loads(val)
        except json.JSONDecodeError:
            pass  # keep as string
        if isinstance(val, list):
            # frozen Config fields are tuples; a JSON list would make the
            # dataclass unhashable and crash the lru_cache-keyed decode
            # factories (review finding; from_dict already converts)
            val = tuple(val)
        out.setdefault(section, {})[name] = val
    return out


def _load_cfg(args) -> "Config":
    from vag_nmt_tpu.core.config import Config, preset

    if getattr(args, "config", None):
        with open(args.config) as f:
            cfg = Config.from_json(f.read())
    else:
        cfg = preset(args.preset)
    ov = _parse_overrides(args.set or [])
    if getattr(args, "data_dir", None):
        ov.setdefault("data", {})["data_dir"] = args.data_dir
    if ov:
        cfg = cfg.replace(**ov)
    return cfg


def _mesh_or_none(cfg):
    import jax

    from vag_nmt_tpu.parallel.sharding import make_mesh

    n_model = max(1, cfg.mesh.model_axis)
    if len(jax.devices()) <= 1 and n_model == 1:
        return None                      # single device: no mesh needed
    return make_mesh(n_data=cfg.mesh.data_axis, n_model=n_model)


def _load_split_data(cfg, split: str, *, with_target: bool = True):
    from vag_nmt_tpu.data.datasets import (
        default_feature_file,
        load_parallel_split,
    )
    from vag_nmt_tpu.data.vocab import Vocab

    d = cfg.data
    src_vocab = Vocab.load(os.path.join(d.data_dir, f"vocab.{d.src_lang}.json"))
    tgt_vocab = Vocab.load(os.path.join(d.data_dir, f"vocab.{d.tgt_lang}.json"))
    feat = ""
    if cfg.model.multimodal:
        feat = d.feature_file or default_feature_file(split)
        if not os.path.exists(os.path.join(d.data_dir, feat)):
            raise SystemExit(
                f"multimodal config but no feature file {feat} in {d.data_dir}"
                " (run extract-features, or --set model.multimodal=false)")
    exs = load_parallel_split(
        d.data_dir, split, d.src_lang, d.tgt_lang, src_vocab, tgt_vocab,
        with_target=with_target, feature_file=feat,
        max_src_len=d.max_src_len, max_tgt_len=d.max_tgt_len)
    return exs, src_vocab, tgt_vocab


def _sized_cfg(cfg, src_vocab, tgt_vocab):
    """Clamp model vocab sizes to the actual vocabulary artifacts."""
    return cfg.replace(model={"src_vocab_size": len(src_vocab),
                              "tgt_vocab_size": len(tgt_vocab)})


# ---------------------------------------------------------------------------
# Commands
# ---------------------------------------------------------------------------

def cmd_preprocess(args) -> None:
    from vag_nmt_tpu.data.pipeline import preprocess_corpus

    langs = args.langs.split(",")
    splits = args.splits.split(",")
    preprocess_corpus(args.raw_dir, args.out_dir, splits, langs,
                      bpe_merges=args.bpe_merges,
                      vocab_min_freq=args.vocab_min_freq,
                      vocab_max_size=args.vocab_max_size,
                      lower=not (args.no_lower or args.truecase),
                      truecase=args.truecase,
                      tokenizer=args.tokenizer)
    print(f"preprocessed {splits} x {langs} -> {args.out_dir}")


def cmd_train(args) -> None:
    if getattr(args, "debug_nans", False):
        import jax

        jax.config.update("jax_debug_nans", True)
    from vag_nmt_tpu.core.metrics import MetricsLogger
    from vag_nmt_tpu.data.bpe import remove_bpe
    from vag_nmt_tpu.data.datasets import resolve_splits
    from vag_nmt_tpu.train.loop import train_loop

    cfg = _load_cfg(args)
    train_split, dev_split, _ = resolve_splits(cfg.data.dataset)
    train_exs, src_vocab, tgt_vocab = _load_split_data(cfg, train_split)
    dev_exs, _, _ = _load_split_data(cfg, dev_split)
    cfg = _sized_cfg(cfg, src_vocab, tgt_vocab)
    if args.resume:
        cfg = cfg.replace(train={"resume": True})
    if args.max_epochs:
        cfg = cfg.replace(train={"max_epochs": args.max_epochs})

    dev_refs = [
        " ".join(remove_bpe(tgt_vocab.decode(ex.tgt))) for ex in dev_exs
    ]
    os.makedirs(args.out_dir, exist_ok=True)
    with open(os.path.join(args.out_dir, "config.json"), "w") as f:
        f.write(cfg.to_json())
    logger = MetricsLogger(os.path.join(args.out_dir, "metrics.jsonl"))
    from vag_nmt_tpu.core.profiling import maybe_trace

    with maybe_trace(args.profile_dir):
        result = train_loop(cfg, args.out_dir, train_exs, dev_exs, tgt_vocab,
                            dev_refs, mesh=_mesh_or_none(cfg),
                            max_steps=args.max_steps, logger=logger)
    print(json.dumps(result))


def cmd_translate(args) -> None:
    import jax

    from vag_nmt_tpu.core.config import Config
    from vag_nmt_tpu.decode.translate import translate_corpus
    from vag_nmt_tpu.train.checkpoint import load_checkpoint
    from vag_nmt_tpu.train.state import create_train_state

    # Prefer the config saved at train time (it has the right vocab sizes).
    saved = os.path.join(args.checkpoint, "config.json")
    if not getattr(args, "config", None) and os.path.exists(saved):
        args.config = saved
    cfg = _load_cfg(args)
    exs, src_vocab, tgt_vocab = _load_split_data(
        cfg, args.split, with_target=False)
    cfg = _sized_cfg(cfg, src_vocab, tgt_vocab)

    template = create_train_state(jax.random.key(0), cfg)
    ckpt_dir = os.path.join(args.checkpoint, cfg.train.checkpoint_dir)
    state, _ = load_checkpoint(ckpt_dir, args.tag, template)
    from vag_nmt_tpu.core.profiling import maybe_trace

    with maybe_trace(args.profile_dir):
        # Multi-device hosts shard decode rows over the 'data' axis
        # (hypotheses bit-identical to single-device, tested); single
        # device gets mesh=None and the packed one-buffer transport.
        hyps, stats = translate_corpus(
            state.params, cfg, exs, tgt_vocab,
            beam_size=args.beam,
            nbest=args.nbest,
            mesh=_mesh_or_none(cfg))
    with open(args.output, "w", encoding="utf-8") as f:
        if args.nbest:
            # Moses n-best list convention: "<sent-id> ||| <hyp> ||| <score>"
            for i, cands in enumerate(hyps):
                for text, score in cands:
                    f.write(f"{i} ||| {text} ||| {score:.6f}\n")
        else:
            f.write("\n".join(hyps) + "\n")
    print(json.dumps(stats))


def cmd_score(args) -> None:
    from vag_nmt_tpu.data.datasets import read_lines
    from vag_nmt_tpu.evaluation.bleu import corpus_bleu
    from vag_nmt_tpu.evaluation.meteor import meteor_score

    hyps = read_lines(args.hyp)
    refs = read_lines(args.ref)
    r = corpus_bleu(hyps, refs)
    out = {"bleu": r.bleu, "precisions": r.precisions,
           "brevity_penalty": r.brevity_penalty}
    if args.meteor:
        out["meteor"] = meteor_score(hyps, refs, lang=args.lang,
                                     jar=args.meteor_jar or None)
    print(json.dumps(out))
    print(str(r), file=sys.stderr)


def cmd_retrieval(args) -> None:
    import jax
    import numpy as np

    from vag_nmt_tpu.data.batching import BucketBatcher
    from vag_nmt_tpu.evaluation.retrieval import retrieval_recall
    from vag_nmt_tpu.models import embeddings_for_retrieval
    from vag_nmt_tpu.train.checkpoint import load_checkpoint
    from vag_nmt_tpu.train.state import create_train_state

    saved = os.path.join(args.checkpoint, "config.json")
    if not getattr(args, "config", None) and os.path.exists(saved):
        args.config = saved
    cfg = _load_cfg(args)
    exs, src_vocab, tgt_vocab = _load_split_data(cfg, args.split)
    cfg = _sized_cfg(cfg, src_vocab, tgt_vocab)

    template = create_train_state(jax.random.key(0), cfg)
    ckpt_dir = os.path.join(args.checkpoint, cfg.train.checkpoint_dir)
    state, _ = load_checkpoint(ckpt_dir, args.tag, template)

    emb_fn = jax.jit(
        lambda p, b: embeddings_for_retrieval(p, cfg.model, b))
    batcher = BucketBatcher(exs, cfg.decode.decode_batch_size,
                            cfg.data.length_buckets, include_image=True,
                            img_dim=cfg.model.img_feat_dim)
    n = len(exs)
    img = np.zeros((n, cfg.model.shared_dim), np.float32)
    txt = np.zeros((n, cfg.model.shared_dim), np.float32)
    for batch in batcher.epoch(0, shuffle=False):
        feed = {k: v for k, v in batch.items() if k != "index"}
        ie, te = jax.device_get(emb_fn(state.params, feed))
        for r in range(ie.shape[0]):
            if batch["sample_mask"][r] > 0:
                img[batch["index"][r]] = ie[r]
                txt[batch["index"][r]] = te[r]
    print(json.dumps(retrieval_recall(img, txt)))


def cmd_translate_text(args) -> None:
    from vag_nmt_tpu.decode.serve import Translator

    tr = Translator.from_run(args.checkpoint, data_dir=args.data_dir or None,
                             tag=args.tag)
    if args.input == "-":
        lines = [ln.rstrip("\n") for ln in sys.stdin]
    else:
        with open(args.input, encoding="utf-8") as f:
            lines = [ln.rstrip("\n") for ln in f]
    images = None
    if args.features:
        import numpy as np

        images = np.load(args.features)
    # one-shot offline tool: the whole-request single-dispatch program is
    # fastest here (no warmed server to protect from fresh compiles)
    hyps = tr.translate(lines, images=images, beam_size=args.beam, bulk=True)
    out = open(args.output, "w", encoding="utf-8") if args.output else sys.stdout
    for h in hyps:
        out.write(h + "\n")
    if args.output:
        out.close()


def cmd_extract_features(args) -> None:
    from vag_nmt_tpu.data.extract_features import extract_to_file

    extract_to_file(args.image_dir, args.image_list, args.out,
                    corpus_path=args.corpus or None,
                    batch_size=args.batch_size)
    print(f"features -> {args.out}")


def cmd_make_toy(args) -> None:
    from vag_nmt_tpu.data.datasets import write_toy_corpus
    from vag_nmt_tpu.data.pipeline import preprocess_toy

    write_toy_corpus(args.out_dir, n_train=args.n_train, n_val=args.n_val,
                     n_test=args.n_test, img_dim=args.img_dim)
    preprocess_toy(args.out_dir)
    print(f"toy corpus -> {args.out_dir}")


# ---------------------------------------------------------------------------

def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="vag_nmt_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    def common(p, data=True):
        p.add_argument("--preset", default="m30k_ende_vag")
        p.add_argument("--config", default=None,
                       help="config.json path (overrides --preset)")
        p.add_argument("--set", action="append", default=[],
                       metavar="SECTION.KEY=VAL")
        if data:
            p.add_argument("--data-dir", required=True)

    p = sub.add_parser("preprocess", help="tokenize+BPE+vocab artifacts")
    p.add_argument("--raw-dir", required=True)
    p.add_argument("--out-dir", required=True)
    p.add_argument("--langs", default="en,de")
    p.add_argument("--splits", default="train,val,test2016,test2017")
    p.add_argument("--bpe-merges", type=int, default=10000)
    p.add_argument("--vocab-min-freq", type=int, default=1)
    p.add_argument("--vocab-max-size", type=int, default=0)
    p.add_argument("--tokenizer", choices=("moses", "simple"),
                   default="moses")
    p.add_argument("--truecase", action="store_true",
                   help="train+apply a truecaser instead of lowercasing")
    p.add_argument("--no-lower", action="store_true",
                   help="keep original casing (no truecaser, no lowercase)")
    p.set_defaults(fn=cmd_preprocess)

    p = sub.add_parser("train", help="train a preset end to end")
    common(p)
    p.add_argument("--out-dir", required=True)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--max-epochs", type=int, default=None)
    p.add_argument("--profile-dir", default="",
                   help="write a jax.profiler trace of the run here")
    p.add_argument("--debug-nans", action="store_true",
                   help="enable jax_debug_nans (traps the first NaN/Inf "
                        "produced on device; slow — debugging only)")
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("translate", help="decode a split to a file")
    common(p)
    p.add_argument("--checkpoint", required=True, help="train out-dir")
    p.add_argument("--tag", default="best", choices=["best", "last"])
    p.add_argument("--split", default="test2016")
    p.add_argument("--output", required=True)
    p.add_argument("--beam", type=int, default=None)
    p.add_argument("--nbest", type=int, default=0,
                   help="write an n-best list (Moses '<id> ||| <hyp> ||| "
                        "<score>' lines) instead of one line per sentence")
    p.add_argument("--profile-dir", default="",
                   help="write a jax.profiler trace of the decode here")
    p.set_defaults(fn=cmd_translate)

    p = sub.add_parser("score", help="BLEU (+METEOR) a hypothesis file")
    p.add_argument("--hyp", required=True)
    p.add_argument("--ref", required=True)
    p.add_argument("--meteor", action="store_true")
    p.add_argument("--meteor-jar", default="")
    p.add_argument("--lang", default="de")
    p.set_defaults(fn=cmd_score)

    p = sub.add_parser("retrieval", help="image<->text R@K on a split")
    common(p)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--tag", default="best", choices=["best", "last"])
    p.add_argument("--split", default="test2017")
    p.set_defaults(fn=cmd_retrieval)

    p = sub.add_parser("translate-text",
                       help="serving-style: raw text lines -> translations")
    p.add_argument("--checkpoint", required=True, help="train out-dir")
    p.add_argument("--data-dir", default="",
                   help="bpe/vocab artifact dir (default: from saved config)")
    p.add_argument("--tag", default="best", choices=["best", "last"])
    p.add_argument("--input", required=True, help="text file, or - for stdin")
    p.add_argument("--output", default="", help="default: stdout")
    p.add_argument("--features", default="",
                   help="optional (N, 2048) .npy aligned with input lines")
    p.add_argument("--beam", type=int, default=None)
    p.set_defaults(fn=cmd_translate_text)

    p = sub.add_parser("extract-features",
                       help="offline ResNet-50 pool5 features -> .npy")
    p.add_argument("--image-dir", required=True)
    p.add_argument("--image-list", required=True,
                   help="one image filename per corpus line")
    p.add_argument("--out", required=True)
    p.add_argument("--corpus", default="",
                   help="corpus text file for the alignment checksum")
    p.add_argument("--batch-size", type=int, default=32)
    p.set_defaults(fn=cmd_extract_features)

    p = sub.add_parser("make-toy", help="materialize the synthetic toy corpus")
    p.add_argument("--out-dir", required=True)
    p.add_argument("--n-train", type=int, default=400)
    p.add_argument("--n-val", type=int, default=50)
    p.add_argument("--n-test", type=int, default=50)
    p.add_argument("--img-dim", type=int, default=64)
    p.set_defaults(fn=cmd_make_toy)

    return ap


def _enable_compile_cache() -> None:
    """Persistent XLA compilation cache for every CLI invocation: each
    distinct batch/decode shape is one program, stable across runs, and a
    cold compile costs 20-150 s on a tunneled chip (seconds locally) —
    without the cache every `translate`/`train` process pays it all again.
    Override the location with VAG_JAX_CACHE_DIR; set it empty to disable."""
    loc = os.environ.get("VAG_JAX_CACHE_DIR",
                         os.path.expanduser("~/.cache/vag_nmt_tpu/jax"))
    if not loc:
        return
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", loc)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass    # never let cache setup break the CLI


def main(argv: Optional[List[str]] = None) -> None:
    args = build_parser().parse_args(argv)
    _enable_compile_cache()
    args.fn(args)


if __name__ == "__main__":
    main()
