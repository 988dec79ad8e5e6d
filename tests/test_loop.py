"""train_loop behavior tests (SURVEY.md C11): end-to-end toy run, resume
metadata semantics on mid-epoch stops, missing-feature failure, host_shard."""

import json
import os

import pytest

from vag_nmt_tpu.core.config import preset
from vag_nmt_tpu.data.batching import Example
from vag_nmt_tpu.data.datasets import make_toy_examples, toy_vocab
from vag_nmt_tpu.parallel.sharding import host_shard
from vag_nmt_tpu.train.loop import train_loop


def _toy_setup(n_train=64, n_dev=16):
    cfg = preset("toy").replace(train=dict(eval_every_steps=0))
    train = make_toy_examples(n_train, seed=0, img_dim=cfg.model.img_feat_dim)
    dev = make_toy_examples(n_dev, seed=1, img_dim=cfg.model.img_feat_dim)
    vocab = toy_vocab()
    refs = [" ".join(vocab.itos[t] for t in ex.tgt) for ex in dev]
    return cfg, train, dev, vocab, refs


def _steps_per_epoch(cfg, train):
    from vag_nmt_tpu.data.batching import BucketBatcher

    b = BucketBatcher(train, cfg.data.batch_size, cfg.data.length_buckets,
                      seed=cfg.data.shuffle_seed)
    return len(list(b.epoch(0)))


def test_loop_runs_and_checkpoints(tmp_path):
    cfg, train, dev, vocab, refs = _toy_setup()
    spe = _steps_per_epoch(cfg, train)
    stop_at = spe + 1                 # one batch INTO epoch 1
    out = train_loop(cfg, str(tmp_path), train, dev, vocab, refs,
                     max_steps=stop_at)
    assert out["steps"] == float(stop_at)
    ckpt = tmp_path / cfg.train.checkpoint_dir
    assert (ckpt / "state_last.msgpack").exists()
    meta = json.loads((ckpt / "meta_last.json").read_text())
    # Stopping mid epoch 1 must record epoch 1 (not 2): claiming the
    # interrupted epoch completed would skip its unvisited batches on resume.
    assert meta["epoch"] == 1
    assert meta["step"] == stop_at


def test_loop_resume_continues_from_interrupted_epoch(tmp_path):
    cfg, train, dev, vocab, refs = _toy_setup()
    train_loop(cfg, str(tmp_path), train, dev, vocab, refs, max_steps=10)
    cfg_r = cfg.replace(train=dict(resume=True, eval_every_steps=0))
    out = train_loop(cfg_r, str(tmp_path), train, dev, vocab, refs,
                     max_steps=18)
    # resumed at epoch 2 with step counter 10; epochs 2..n add 4 steps each
    assert out["steps"] == 18.0
    meta = json.loads(
        (tmp_path / cfg.train.checkpoint_dir / "meta_last.json").read_text())
    assert meta["step"] == 18


def test_loop_raises_on_missing_train_image(tmp_path):
    cfg, train, dev, vocab, refs = _toy_setup()
    broken = list(train)
    ex = broken[3]
    broken[3] = Example(src=ex.src, tgt=ex.tgt, img=None, index=ex.index)
    with pytest.raises(ValueError, match="missing .img"):
        train_loop(cfg, str(tmp_path), broken, dev, vocab, refs, max_steps=2)


def test_host_shard_partitions_and_single_host_identity():
    items = list(range(10))
    assert host_shard(items, 0, 1) == items
    shards = [host_shard(items, i, 3) for i in range(3)]
    assert shards[1] == [1, 4, 7]
    assert sorted(x for s in shards for x in s) == items
    assert not (set(shards[0]) & set(shards[1]))


def test_mid_epoch_resume_is_batch_exact(tmp_path):
    """SURVEY.md §5 data-cursor spec: interrupt mid-epoch, resume, and the
    final params must be BIT-IDENTICAL to an uninterrupted run — the resume
    fast-forwards the epoch's batch stream to the exact next batch and the
    step RNG folds in state.step."""
    import numpy as np
    import jax

    from vag_nmt_tpu.train.checkpoint import load_checkpoint
    from vag_nmt_tpu.train.state import create_train_state

    cfg, train, dev, vocab, refs = _toy_setup()
    spe = _steps_per_epoch(cfg, train)
    assert spe >= 3
    stop_at = spe // 2                 # strictly inside epoch 0
    total = spe + 1                    # past the epoch boundary

    d_ref = tmp_path / "ref"
    d_ab = tmp_path / "ab"
    train_loop(cfg, str(d_ref), train, dev, vocab, refs, max_steps=total)

    train_loop(cfg, str(d_ab), train, dev, vocab, refs, max_steps=stop_at)
    meta = json.loads(
        (d_ab / cfg.train.checkpoint_dir / "meta_last.json").read_text())
    assert meta["epoch"] == 0
    assert meta["epoch_cursor"] == stop_at
    cfg_r = cfg.replace(train=dict(resume=True, eval_every_steps=0))
    train_loop(cfg_r, str(d_ab), train, dev, vocab, refs, max_steps=total)

    tmpl = create_train_state(jax.random.key(cfg.train.seed), cfg)
    s_ref, _ = load_checkpoint(
        str(d_ref / cfg.train.checkpoint_dir), "last", tmpl)
    s_ab, _ = load_checkpoint(
        str(d_ab / cfg.train.checkpoint_dir), "last", tmpl)
    assert int(s_ref.step) == int(s_ab.step) == total
    ref_leaves = jax.tree.leaves(s_ref.params)
    ab_leaves = jax.tree.leaves(s_ab.params)
    for a, b in zip(ref_leaves, ab_leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_at_or_past_max_steps_trains_nothing(tmp_path):
    """Review finding: a run resumed AT max_steps must not dispatch any
    further step (each rerun used to advance 'last' by one step, breaking
    the bit-identical-resume guarantee)."""
    import jax
    import numpy as np

    from vag_nmt_tpu.train.checkpoint import load_checkpoint
    from vag_nmt_tpu.train.state import create_train_state

    cfg, train, dev, vocab, refs = _toy_setup()
    out1 = train_loop(cfg, str(tmp_path), train, dev, vocab, refs,
                      max_steps=3)
    assert out1["steps"] == 3.0
    template = create_train_state(jax.random.key(0), cfg)
    ckpt_dir = str(tmp_path / cfg.train.checkpoint_dir)
    st, _ = load_checkpoint(ckpt_dir, "last", template)
    p_before = np.asarray(jax.tree.leaves(st.params)[0])

    cfg_r = cfg.replace(train=dict(resume=True, eval_every_steps=0))
    out2 = train_loop(cfg_r, str(tmp_path), train, dev, vocab, refs,
                      max_steps=3)
    assert out2["steps"] == 3.0
    st2, _ = load_checkpoint(ckpt_dir, "last", template)
    assert int(st2.step) == 3
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(st2.params)[0]), p_before)
