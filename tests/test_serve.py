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
