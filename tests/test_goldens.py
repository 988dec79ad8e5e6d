"""Fixed-seed regression goldens (SURVEY.md §4, VERDICT r1 item 6).

Pins (a) 50-step fp32 loss curves for the toy multimodal and text-only
configs and (b) beam-search hypotheses for a fixed-seed model, against
checked-in golden files. A numerics change that shifts any step loss by more
than 1e-4 — e.g. a kernel rework that would pass every relative/property
test — fails here.

Regenerate intentionally with:  REGEN_GOLDENS=1 python -m pytest tests/test_goldens.py
(only after establishing the numerics change is intended; goldens were
generated on the CPU backend with jax_default_matmul_precision=highest,
which conftest.py forces for every test run)."""

import json
import os

import jax
import numpy as np
import pytest

from vag_nmt_tpu.core.config import preset
from vag_nmt_tpu.data.batching import BucketBatcher
from vag_nmt_tpu.data.datasets import make_toy_examples, toy_vocab
from vag_nmt_tpu.decode.translate import translate_corpus
from vag_nmt_tpu.train.state import create_train_state
from vag_nmt_tpu.train.step import make_train_step

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
REGEN = bool(os.environ.get("REGEN_GOLDENS"))
N_STEPS = 50
ATOL = 1e-4


def _loss_curve(cfg, n_steps=N_STEPS):
    exs = make_toy_examples(64, seed=41, img_dim=cfg.model.img_feat_dim)
    state = create_train_state(jax.random.key(cfg.train.seed), cfg)
    batcher = BucketBatcher(exs, cfg.data.batch_size, cfg.data.length_buckets,
                            seed=7, include_image=cfg.model.multimodal,
                            img_dim=cfg.model.img_feat_dim)
    step_fn, _ = make_train_step(cfg)
    rng = jax.random.key(cfg.train.seed + 1)
    losses = []
    epoch = 0
    while len(losses) < n_steps:
        for batch in batcher.epoch(epoch):
            state, aux = step_fn(state, batch, rng)
            losses.append(float(aux["loss"]))
            if len(losses) >= n_steps:
                break
        epoch += 1
    return losses


def _check_or_regen(name, values):
    path = os.path.join(GOLDEN_DIR, name)
    if REGEN or not os.path.exists(path):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        with open(path, "w") as f:
            json.dump(values, f, indent=1)
        pytest.skip(f"regenerated golden {name}")
    with open(path) as f:
        golden = json.load(f)
    return golden


def test_golden_loss_curve_multimodal():
    losses = _loss_curve(preset("toy"))
    golden = _check_or_regen("loss_toy_multimodal.json", losses)
    np.testing.assert_allclose(losses, golden, rtol=0, atol=ATOL)


def test_golden_loss_curve_text_only():
    cfg = preset("toy").replace(model=dict(multimodal=False))
    losses = _loss_curve(cfg)
    golden = _check_or_regen("loss_toy_text_only.json", losses)
    np.testing.assert_allclose(losses, golden, rtol=0, atol=ATOL)


def test_golden_beam_hypotheses():
    """Beam-3 hypotheses of a fixed-seed (untrained) model on fixed examples
    must match the golden file EXACTLY — pins the whole decode stack
    (encoder, grounding, init, conditional GRU, attention, beam scoring,
    length norm, de-vocab)."""
    from vag_nmt_tpu.data.batching import Example
    from vag_nmt_tpu.models import init_params

    cfg = preset("toy")
    params = init_params(jax.random.key(5), cfg.model)
    rng = np.random.RandomState(13)
    exs = [Example(src=list(rng.randint(4, cfg.model.src_vocab_size,
                                        rng.randint(3, 14))),
                   img=rng.randn(cfg.model.img_feat_dim).astype(np.float32),
                   index=i)
           for i in range(24)]
    hyps, _ = translate_corpus(params, cfg, exs, toy_vocab(), beam_size=3,
                               de_bpe=False)
    golden = _check_or_regen("beam_toy.json", hyps)
    assert hyps == golden
