"""Serving API (decode/serve.py): train a toy run, then translate raw text
through Translator and the translate-text CLI."""

import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def toy_run(tmp_path_factory):
    d = tmp_path_factory.mktemp("serve")
    data_dir = str(d / "data")
    out_dir = str(d / "run")
    from vag_nmt_tpu.cli import main

    main(["make-toy", "--out-dir", data_dir, "--n-train", "200"])
    # 200 steps = exactly one dev eval (toy evals every 200), so a "best"
    # checkpoint exists for Translator.from_run's default tag
    main(["train", "--preset", "toy", "--data-dir", data_dir,
          "--out-dir", out_dir, "--max-steps", "200"])
    return data_dir, out_dir


def test_translator_raw_lines(toy_run):
    from vag_nmt_tpu.data.datasets import toy_vocab
    from vag_nmt_tpu.decode.serve import Translator

    data_dir, out_dir = toy_run
    tr = Translator.from_run(out_dir, data_dir=data_dir)
    v = toy_vocab()
    lines = ["w1 w2 w3", "w5 w4 w3 w2 w1"]
    hyps = tr.translate(lines)
    assert len(hyps) == 2
    for h in hyps:
        for u in h.split():
            assert u in v.stoi


def test_translator_with_images(toy_run):
    from vag_nmt_tpu.decode.serve import Translator

    data_dir, out_dir = toy_run
    tr = Translator.from_run(out_dir, data_dir=data_dir)
    imgs = np.random.RandomState(0).randn(
        2, tr.cfg.model.img_feat_dim).astype(np.float32)
    hyps = tr.translate(["w1 w2", "w3 w4 w5"], images=imgs, beam_size=1)
    assert len(hyps) == 2


def test_translator_warmup(toy_run):
    """warmup() drives one dummy request per source-length bucket (the
    compile-shape key) and a live translate afterward matches an unwarmed
    Translator's output — warmup populates caches, never perturbs state."""
    from vag_nmt_tpu.decode.serve import Translator

    data_dir, out_dir = toy_run
    tr = Translator.from_run(out_dir, data_dir=data_dir)
    lines = ["w1 w2 w3", "w5 w4 w3 w2 w1"]
    baseline = tr.translate(lines)

    tr2 = Translator.from_run(out_dir, data_dir=data_dir)
    n = tr2.warmup()
    assert n == len(tr2.cfg.data.length_buckets)
    assert tr2.translate(lines) == baseline


def test_translate_text_cli(toy_run, tmp_path):
    from vag_nmt_tpu.cli import main

    data_dir, out_dir = toy_run
    inp = tmp_path / "in.txt"
    outp = tmp_path / "out.txt"
    inp.write_text("w1 w2 w3\nw9 w8\n")
    main(["translate-text", "--checkpoint", out_dir, "--data-dir", data_dir,
          "--input", str(inp), "--output", str(outp)])
    lines = outp.read_text().splitlines()
    assert len(lines) == 2


def test_translator_honors_preprocess_manifest(tmp_path):
    """from_run replays the data dir's preprocess.json: Moses tokenizer +
    learned truecaser before BPE/numericalization, and display=True
    detruecases + Moses-detokenizes the output."""
    import json

    import jax

    from vag_nmt_tpu.core.config import preset
    from vag_nmt_tpu.data.moses import Truecaser
    from vag_nmt_tpu.data.vocab import Vocab
    from vag_nmt_tpu.decode.serve import Translator
    from vag_nmt_tpu.train.checkpoint import save_checkpoint
    from vag_nmt_tpu.train.state import create_train_state

    data_dir = tmp_path / "data"
    run_dir = tmp_path / "run"
    (run_dir / "checkpoints").mkdir(parents=True)
    data_dir.mkdir()

    cfg = preset("toy").replace(
        model=dict(multimodal=False, src_vocab_size=16, tgt_vocab_size=16),
        data=dict(data_dir=str(data_dir), src_lang="en", tgt_lang="de"))
    words = ["<pad>", "<unk>", "<sos>", "<eos>", "the", "man", "walks",
             "Paris", ",", ".", "!", "a", "dog", "in", "sees", "x"]
    Vocab(words).save(str(data_dir / "vocab.en.json"))
    Vocab(words).save(str(data_dir / "vocab.de.json"))
    tc = Truecaser.train([["the", "man", "walks", "in", "Paris", "."]] * 3
                         + [["a", "dog", "sees", "the", "man", "."]] * 3)
    tc.save(str(data_dir / "truecase.en.json"))
    (data_dir / "preprocess.json").write_text(json.dumps(
        {"tokenizer": "moses", "lower": False, "truecase": True}))

    state = create_train_state(jax.random.key(0), cfg)
    save_checkpoint(str(run_dir / "checkpoints"), "best", state, {})
    (run_dir / "config.json").write_text(cfg.to_json())

    tr = Translator.from_run(str(run_dir), data_dir=str(data_dir))
    assert tr.tokenizer == "moses" and tr.truecaser is not None

    # "The man walks, in Paris." -> moses tok splits ',' and '.';
    # truecaser lowercases sentence-initial "The"; "Paris" keeps its capital
    ids = tr._encode_line("The man walks, in Paris.")
    decoded = [words[i] for i in ids]
    assert decoded == ["the", "man", "walks", ",", "in", "Paris", "."]

    # display path: random params, but output must be detokenized text
    out = tr.translate(["The man walks."], display=True)
    assert len(out) == 1 and isinstance(out[0], str)
    assert "@@" not in out[0]


def test_translate_chunked_matches_bulk_and_hits_warmed_shapes(toy_run):
    """Requests longer than batch_size decode in fixed batch_size-line
    chunks (review finding r4: the old whole-request program's shape grew
    with the request, so warmup's "only compiled programs" contract was
    false for any request longer than a batch). Outputs must equal the
    bulk single-dispatch form, and every program invoked after warmup
    must carry the warmed (n_super=1, S=1) shape."""
    from vag_nmt_tpu.decode import translate as tr_mod
    from vag_nmt_tpu.decode.serve import Translator

    data_dir, out_dir = toy_run
    tr = Translator.from_run(out_dir, data_dir=data_dir)
    bs = 4
    lines = [f"w1 w2 w{1 + i % 5}" for i in range(11)]  # 11 > 2 full chunks

    bulk = tr.translate(lines, bulk=True, batch_size=bs)
    chunked = tr.translate(lines, batch_size=bs, streaming=False)
    assert chunked == bulk
    assert len(chunked) == len(lines)

    # shape contract: warm, then capture every fused-program input shape
    tr.warmup(batch_size=bs)
    seen = []
    orig = tr_mod.make_fused_corpus_fn.__wrapped__

    def spy(cfg, beam_size, max_len, multimodal, mesh=None, nbest=False,
            packed_spec=None, use_tables=False, two_phase=False,
            streaming=False, env_key=()):
        fn = orig(cfg, beam_size, max_len, multimodal, mesh, nbest,
                  packed_spec, use_tables, two_phase, streaming, env_key)

        def wrapped(params, *args):
            if packed_spec is not None:
                src = dict((k, shape) for k, _, shape in packed_spec)["src"]
                seen.append(src)              # (ns, S, B, t_src)
            return fn(params, *args)

        return wrapped

    old = tr_mod.make_fused_corpus_fn
    tr_mod.make_fused_corpus_fn = spy
    try:
        out = tr.translate(lines, batch_size=bs, streaming=False)
    finally:
        tr_mod.make_fused_corpus_fn = old
    assert out == bulk
    assert seen, "spy never engaged — transport path changed?"
    for shape in seen:
        assert shape[0] == 1 and shape[1] == 1, shape  # (ns, S, B, t_src)
        assert shape[2] == bs, shape


def test_translate_streaming_pool_matches_chunked(toy_run):
    """streaming=True decodes a multi-chunk request via the streaming-refill
    pooled program (one dispatch, working set = batch_size rows refilling
    from the request pool). EXACT architecture: hypotheses must equal the
    chunk-loop and bulk outputs; single-chunk requests fall back to the
    plain program."""
    from vag_nmt_tpu.decode.serve import Translator

    data_dir, out_dir = toy_run
    tr = Translator.from_run(out_dir, data_dir=data_dir)
    bs = 4
    lines = [f"w1 w2 w{1 + i % 5} w{1 + (i * 3) % 7}"[: 3 + 4 * (i % 3)]
             for i in range(11)]

    chunked = tr.translate(lines, batch_size=bs, streaming=False)
    pooled = tr.translate(lines, batch_size=bs, streaming=True)
    assert pooled == chunked
    # warmup's streaming_chunks drives the pooled shape family too
    n = tr.warmup(batch_size=bs, streaming_chunks=(2,))
    assert n == 2 * len(tr.cfg.data.length_buckets)
    assert tr.translate(lines[: 2 * bs], batch_size=bs,
                        streaming=True) == chunked[: 2 * bs]
    # pool_chunks slicing: an 11-line request at pool_chunks=2 decodes as
    # one 8-row pooled slice + one 3-row plain tail — same hypotheses
    assert tr.translate(lines, batch_size=bs, streaming=True,
                        pool_chunks=2) == chunked
