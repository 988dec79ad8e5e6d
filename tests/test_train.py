"""Integration tests (SURVEY.md §4): toy-corpus overfit on CPU, checkpoint
round-trip + bit-exact resume, and DP-mesh equivalence."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vag_nmt_tpu.core.config import preset
from vag_nmt_tpu.data.batching import BucketBatcher
from vag_nmt_tpu.data.datasets import make_toy_examples, toy_vocab
from vag_nmt_tpu.decode.translate import translate_corpus
from vag_nmt_tpu.evaluation.bleu import corpus_bleu
from vag_nmt_tpu.parallel.sharding import make_mesh
from vag_nmt_tpu.train.checkpoint import (
    has_checkpoint,
    load_checkpoint,
    save_checkpoint,
)
from vag_nmt_tpu.train.state import create_train_state
from vag_nmt_tpu.train.step import make_train_step
from vag_nmt_tpu.utils.pytree import tree_allclose


@pytest.fixture(scope="module")
def toy_cfg():
    return preset("toy")


def _run_steps(cfg, exs, n_steps, state=None, mesh=None):
    if state is None:
        state = create_train_state(jax.random.key(cfg.train.seed), cfg)
    batcher = BucketBatcher(
        exs, cfg.data.batch_size, cfg.data.length_buckets,
        seed=cfg.data.shuffle_seed, include_image=cfg.model.multimodal,
        img_dim=cfg.model.img_feat_dim)
    example_batch = next(iter(batcher.epoch(0)))
    step_fn, state_sh = make_train_step(cfg, mesh, state, example_batch)
    if state_sh is not None:
        state = jax.device_put(state, state_sh)
    rng = jax.random.key(cfg.train.seed + 1)
    losses = []
    done = False
    for epoch in range(1000):
        for batch in batcher.epoch(epoch):
            state, aux = step_fn(state, batch, rng)
            losses.append(float(aux["loss"]))
            if len(losses) >= n_steps:
                done = True
                break
        if done:
            break
    return state, losses


def test_toy_overfit_loss_drops_and_bleu_high(toy_cfg):
    exs = make_toy_examples(64, seed=0, img_dim=toy_cfg.model.img_feat_dim)
    state, losses = _run_steps(toy_cfg, exs, 340)
    # Per-batch loss is noisy this deep into overfitting (single batches spike
    # past 1.0 while the model is near-solved), and the trajectory is chaotic
    # under accumulation-order changes, so assert on the median of the last 20
    # batch losses rather than whichever batch happens to land at step 340.
    tail = float(np.median(losses[-20:]))
    assert tail < 0.3, f"no overfit: median tail loss {tail:.3f}"
    assert tail < losses[0] / 8

    # Greedy-decode the training set back out; the copy-reverse task should be
    # (nearly) solved, so corpus BLEU should be very high.
    vocab = toy_vocab()
    hyps, stats = translate_corpus(
        state.params, toy_cfg, exs, vocab, beam_size=1, de_bpe=False)
    refs = [" ".join(vocab.itos[t] for t in ex.tgt) for ex in exs]
    bleu = corpus_bleu(hyps, refs)
    assert bleu.bleu > 85.0, f"BLEU {bleu.bleu:.1f}\n{hyps[:3]}\n{refs[:3]}"
    assert stats["sentences"] == 64


def test_beam_decode_at_least_matches_greedy_on_overfit(toy_cfg):
    exs = make_toy_examples(32, seed=1, img_dim=toy_cfg.model.img_feat_dim)
    state, _ = _run_steps(toy_cfg, exs, 180)
    vocab = toy_vocab()
    refs = [" ".join(vocab.itos[t] for t in ex.tgt) for ex in exs]
    g, _ = translate_corpus(state.params, toy_cfg, exs, vocab, beam_size=1,
                            de_bpe=False)
    b, _ = translate_corpus(state.params, toy_cfg, exs, vocab, beam_size=3,
                            de_bpe=False)
    assert corpus_bleu(b, refs).bleu >= corpus_bleu(g, refs).bleu - 1.0


def test_checkpoint_roundtrip_and_bitexact_resume(toy_cfg, tmp_path):
    exs = make_toy_examples(32, seed=2, img_dim=toy_cfg.model.img_feat_dim)
    # run 6 steps, checkpoint, run 4 more
    state6, _ = _run_steps(toy_cfg, exs, 6)
    save_checkpoint(str(tmp_path), "last", state6, {"epoch": 0})
    assert has_checkpoint(str(tmp_path), "last")

    template = create_train_state(jax.random.key(toy_cfg.train.seed), toy_cfg)
    restored, meta = load_checkpoint(str(tmp_path), "last", template)
    assert int(restored.step) == int(state6.step)
    assert tree_allclose(restored.params, jax.device_get(state6.params))

    state10a, _ = _run_steps(toy_cfg, exs, 4, state=state6)
    state10b, _ = _run_steps(toy_cfg, exs, 4, state=restored)
    assert tree_allclose(jax.device_get(state10a.params),
                         jax.device_get(state10b.params))


def test_async_checkpointer_matches_sync_and_survives_donation(toy_cfg,
                                                               tmp_path):
    """AsyncCheckpointer writes the same restorable state as the sync save,
    and its on-device snapshot is immune to the train step donating the
    state buffers right after save() returns."""
    from vag_nmt_tpu.train.checkpoint import AsyncCheckpointer

    exs = make_toy_examples(32, seed=7, img_dim=toy_cfg.model.img_feat_dim)
    state, _ = _run_steps(toy_cfg, exs, 3)
    expected = jax.device_get(state.params)

    ck = AsyncCheckpointer()
    ck.save(str(tmp_path), "last", state, {"epoch": 1})
    # Keep training immediately: donation reuses the live buffers while the
    # background fetch runs off the snapshot.
    state2, _ = _run_steps(toy_cfg, exs, 2, state=state)
    ck.wait()

    template = create_train_state(jax.random.key(toy_cfg.train.seed), toy_cfg)
    restored, meta = load_checkpoint(str(tmp_path), "last", template)
    assert meta["epoch"] == 1
    assert tree_allclose(restored.params, expected)
    assert not tree_allclose(restored.params, jax.device_get(state2.params))


def test_multi_step_dispatch_matches_sequential_single_steps(toy_cfg):
    """lax.scan'ed K-step dispatch is numerically EXACTLY K sequential
    single-step calls (same RNG folding, same update math)."""
    import numpy as np

    from vag_nmt_tpu.train.step import make_multi_step

    cfg = toy_cfg
    exs = make_toy_examples(64, seed=11, img_dim=cfg.model.img_feat_dim)
    batcher = BucketBatcher(exs, cfg.data.batch_size, cfg.data.length_buckets,
                            seed=3, include_image=cfg.model.multimodal,
                            img_dim=cfg.model.img_feat_dim, compact=False)
    by_shape = {}
    for b in batcher.epoch(0, shuffle=False):
        by_shape.setdefault(b["src"].shape + b["tgt_in"].shape, []).append(b)
    chunk = next(v for v in by_shape.values() if len(v) >= 3)[:3]
    stack = {k: np.stack([b[k] for b in chunk]) for k in chunk[0]}
    rng = jax.random.key(9)

    state_a = create_train_state(jax.random.key(0), cfg)
    step_fn, _ = make_train_step(cfg)
    auxes = []
    for b in chunk:
        state_a, aux = step_fn(state_a, b, rng)
        auxes.append(float(aux["loss"]))

    state_b = create_train_state(jax.random.key(0), cfg)
    multi_fn, _ = make_multi_step(cfg)
    state_b, aux_stack = multi_fn(state_b, stack, rng)
    np.testing.assert_allclose(
        np.asarray(aux_stack["loss"]), auxes, rtol=1e-6, atol=1e-7)
    for x, y in zip(jax.tree.leaves(jax.device_get(state_a.params)),
                    jax.tree.leaves(jax.device_get(state_b.params))):
        np.testing.assert_allclose(x, y, rtol=1e-6, atol=1e-7)
    assert int(state_b.step) == 3


def test_multi_step_dp_mesh_matches_single_device(toy_cfg):
    """K-step dispatch under an 8-device DP mesh ≡ single-device K-step."""
    import numpy as np

    from vag_nmt_tpu.train.step import make_multi_step

    cfg = toy_cfg
    exs = make_toy_examples(64, seed=12, img_dim=cfg.model.img_feat_dim)
    batcher = BucketBatcher(exs, cfg.data.batch_size, cfg.data.length_buckets,
                            seed=3, include_image=cfg.model.multimodal,
                            img_dim=cfg.model.img_feat_dim)
    by_shape = {}
    for b in batcher.epoch(0, shuffle=False):
        by_shape.setdefault(b["src"].shape + b["tgt_in"].shape, []).append(b)
    chunk = next(v for v in by_shape.values() if len(v) >= 2)[:2]
    stack = {k: np.stack([b[k] for b in chunk]) for k in chunk[0]}
    rng = jax.random.key(9)

    state_1 = create_train_state(jax.random.key(0), cfg)
    fn_1, _ = make_multi_step(cfg)
    state_1, _ = fn_1(state_1, stack, rng)

    mesh = make_mesh(n_data=8, n_model=1)
    state_8 = create_train_state(jax.random.key(0), cfg)
    fn_8, st_sh = make_multi_step(cfg, mesh, state_8, stack)
    state_8 = jax.device_put(state_8, st_sh)
    state_8, _ = fn_8(state_8, stack, rng)
    for x, y in zip(jax.tree.leaves(jax.device_get(state_1.params)),
                    jax.tree.leaves(jax.device_get(state_8.params))):
        np.testing.assert_allclose(x, y, rtol=2e-3, atol=2e-4)


def test_load_checkpoint_reads_legacy_format(toy_cfg, tmp_path):
    """Pre-bundle checkpoints (raw serialized state + meta sidecar) must
    keep loading — regression for the KeyError on upgrade."""
    import json

    from flax import serialization

    from vag_nmt_tpu.train.checkpoint import _fetch_batched

    state = create_train_state(jax.random.key(0), toy_cfg)
    host = _fetch_batched(state)
    with open(tmp_path / "state_last.msgpack", "wb") as f:
        f.write(serialization.to_bytes(host._asdict()))
    with open(tmp_path / "meta_last.json", "w") as f:
        json.dump({"epoch": 4, "best_bleu": 12.5}, f)

    template = create_train_state(jax.random.key(1), toy_cfg)
    restored, meta = load_checkpoint(str(tmp_path), "last", template)
    assert meta["epoch"] == 4 and meta["best_bleu"] == 12.5
    assert tree_allclose(restored.params, jax.device_get(state.params))


def test_async_checkpointer_races_with_train_steps(toy_cfg, tmp_path):
    """Regression: rapid saves interleaved with train steps. The worker
    thread used to run the pack concatenations (device ops) itself, which
    intermittently ABORTED the process when racing main-thread step
    execution on the CPU runtime; the pack now happens on the caller's
    thread and the worker only transfers + writes."""
    from vag_nmt_tpu.train.checkpoint import AsyncCheckpointer

    exs = make_toy_examples(16, seed=9, img_dim=toy_cfg.model.img_feat_dim)
    state, _ = _run_steps(toy_cfg, exs, 1)
    ck = AsyncCheckpointer()
    for i in range(12):
        ck.save(str(tmp_path), "last", state, {"epoch": i})
        state, _ = _run_steps(toy_cfg, exs, 2, state=state)
    ck.wait()
    template = create_train_state(jax.random.key(toy_cfg.train.seed), toy_cfg)
    restored, meta = load_checkpoint(str(tmp_path), "last", template)
    assert meta["epoch"] == 11


def test_dp_mesh_matches_single_device(toy_cfg):
    """8-virtual-device DP run is numerically ≡ the single-device run at equal
    global batch (SURVEY.md §4 'multi-node without hardware')."""
    exs = make_toy_examples(64, seed=3, img_dim=toy_cfg.model.img_feat_dim)
    state_1, losses_1 = _run_steps(toy_cfg, exs, 5)
    mesh = make_mesh(n_data=8, n_model=1)
    state_8, losses_8 = _run_steps(toy_cfg, exs, 5, mesh=mesh)
    np.testing.assert_allclose(losses_1, losses_8, rtol=2e-4, atol=2e-5)
    a = jax.device_get(state_1.params)
    b = jax.device_get(state_8.params)
    flat_a = jax.tree.leaves(a)
    flat_b = jax.tree.leaves(b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_allclose(x, y, rtol=2e-3, atol=2e-4)


def test_dp_mesh_pallas_kernel_matches_single_device(toy_cfg):
    """The shard_map'ed Pallas GRU path (gru_impl='pallas', interpret mode on
    CPU) under an 8-device DP mesh ≡ the single-device XLA run: the full train
    step — fwd, custom-VJP bwd, weight-grad all-reduce, Adam — agrees."""
    cfg = toy_cfg.replace(model=dict(gru_impl="pallas"))
    exs = make_toy_examples(64, seed=3, img_dim=cfg.model.img_feat_dim)
    state_1, losses_1 = _run_steps(toy_cfg, exs, 3)
    mesh = make_mesh(n_data=8, n_model=1)
    state_8, losses_8 = _run_steps(cfg, exs, 3, mesh=mesh)
    np.testing.assert_allclose(losses_1, losses_8, rtol=2e-4, atol=2e-5)
    for x, y in zip(jax.tree.leaves(jax.device_get(state_1.params)),
                    jax.tree.leaves(jax.device_get(state_8.params))):
        np.testing.assert_allclose(x, y, rtol=2e-3, atol=2e-4)


def test_tp_mesh_matches_single_device(toy_cfg):
    """(data=4, model=2) mesh — vocab-dim TP on embeddings/readout — is
    numerically ≡ the single-device run (SURVEY.md §2 parallelism table)."""
    exs = make_toy_examples(64, seed=3, img_dim=toy_cfg.model.img_feat_dim)
    state_1, losses_1 = _run_steps(toy_cfg, exs, 4)
    mesh = make_mesh(n_data=4, n_model=2)
    state_tp, losses_tp = _run_steps(toy_cfg, exs, 4, mesh=mesh)
    np.testing.assert_allclose(losses_1, losses_tp, rtol=2e-4, atol=2e-5)
    for x, y in zip(jax.tree.leaves(jax.device_get(state_1.params)),
                    jax.tree.leaves(jax.device_get(state_tp.params))):
        np.testing.assert_allclose(x, y, rtol=2e-3, atol=2e-4)


def test_img_table_step_matches_direct_img(toy_cfg):
    """Training with a device-resident feature table + on-device gather is
    numerically ≡ feeding feature rows in the batch."""
    from vag_nmt_tpu.decode.translate import build_img_table

    exs = make_toy_examples(48, seed=5, img_dim=toy_cfg.model.img_feat_dim)
    state_a = create_train_state(jax.random.key(0), toy_cfg)
    state_b = create_train_state(jax.random.key(0), toy_cfg)
    rng = jax.random.key(9)

    b_img = BucketBatcher(exs, 16, toy_cfg.data.length_buckets,
                          include_image=True,
                          img_dim=toy_cfg.model.img_feat_dim)
    b_ids = BucketBatcher(exs, 16, toy_cfg.data.length_buckets,
                          image_ids=True,
                          img_dim=toy_cfg.model.img_feat_dim)
    step_a, _ = make_train_step(toy_cfg)
    step_b, _ = make_train_step(toy_cfg, with_img_table=True)
    table = build_img_table(exs, toy_cfg.model.img_feat_dim)

    for ba, bb in zip(b_img.epoch(0), b_ids.epoch(0)):
        state_a, aux_a = step_a(state_a, ba, rng)
        state_b, aux_b = step_b(state_b, bb, rng, table)
        np.testing.assert_allclose(float(aux_a["loss"]), float(aux_b["loss"]),
                                   rtol=1e-6)
    assert tree_allclose(jax.device_get(state_a.params),
                         jax.device_get(state_b.params), rtol=1e-6, atol=1e-7)


def test_bf16_training_converges(toy_cfg):
    """compute_dtype=bfloat16 trains: loss finite and decreasing (params
    stay fp32; activations/matmuls run bf16 with fp32 accumulation)."""
    cfg = toy_cfg.replace(model=dict(compute_dtype="bfloat16"))
    exs = make_toy_examples(64, seed=11, img_dim=cfg.model.img_feat_dim)
    _, losses = _run_steps(cfg, exs, 30)
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5])
