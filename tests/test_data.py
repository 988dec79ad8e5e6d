"""Data-layer tests (SURVEY.md §4): BPE vs subword-nmt semantics, vocab,
fixed-shape bucket batching, feature-alignment checks."""

import os

import numpy as np
import pytest

from vag_nmt_tpu.core.config import EOS_ID, PAD_ID, SOS_ID
from vag_nmt_tpu.data.batching import BucketBatcher, Example
from vag_nmt_tpu.data.bpe import BPE, learn_bpe, remove_bpe
from vag_nmt_tpu.data.features import load_features, save_features
from vag_nmt_tpu.data.tokenizer import tokenize
from vag_nmt_tpu.data.vocab import Vocab


# ---------------------------------------------------------------------------
# BPE
# ---------------------------------------------------------------------------

def test_bpe_learn_merges_most_frequent_pair_first():
    freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = learn_bpe(freqs, 10)
    assert len(merges) > 0
    # ('e','s') and ('s','t</w>') both have freq 9 = newest(6)+widest(3);
    # the documented deterministic tie-break (lexicographic max) picks the
    # latter. Either is valid subword-nmt behavior.
    assert merges[0] in (("e", "s"), ("s", "t</w>"))


def test_bpe_apply_roundtrip():
    lines = [tokenize(s) for s in [
        "the cat sat on the mat",
        "the dog sat on the log",
        "a cat and a dog and a mat",
    ]]
    freqs = {}
    for toks in lines:
        for t in toks:
            freqs[t] = freqs.get(t, 0) + 1
    merges = learn_bpe(freqs, 50)
    bpe = BPE(merges)
    for toks in lines:
        units = bpe.encode_tokens(toks)
        # every unit either ends a word or carries the @@ continuation
        assert remove_bpe(units) == toks


def test_bpe_unseen_word_segments_to_chars_or_merges():
    merges = learn_bpe({"hello": 10}, 10)
    bpe = BPE(merges)
    units = bpe.encode_tokens(["goodbye"])
    assert remove_bpe(units) == ["goodbye"]


def test_bpe_save_load_roundtrip(tmp_path):
    merges = learn_bpe({"abab": 4, "abc": 2}, 5)
    bpe = BPE(merges)
    p = str(tmp_path / "bpe.json")
    bpe.save(p)
    bpe2 = BPE.load(p)
    assert bpe2.merges == bpe.merges
    assert bpe2.encode_tokens(["ababc"]) == bpe.encode_tokens(["ababc"])


# ---------------------------------------------------------------------------
# Vocab
# ---------------------------------------------------------------------------

def test_vocab_specials_and_ordering():
    v = Vocab.build([["b", "a", "a"], ["a", "c"]])
    assert v.itos[:4] == ["<pad>", "<unk>", "<sos>", "<eos>"]
    # by frequency desc, ties lexicographic
    assert v.itos[4:] == ["a", "b", "c"]
    assert v.encode(["a", "zzz"]) == [4, 1]  # unk
    assert v.decode([4, 5, EOS_ID, PAD_ID]) == ["a", "b"]


def test_vocab_max_size_and_min_freq(tmp_path):
    v = Vocab.build([["a"] * 5 + ["b"] * 3 + ["c"]], min_freq=2, max_size=6)
    assert len(v) == 6
    assert "c" not in v.stoi
    p = str(tmp_path / "v.json")
    v.save(p)
    assert Vocab.load(p).itos == v.itos


# ---------------------------------------------------------------------------
# Batching
# ---------------------------------------------------------------------------

def _examples(n, seed=0, with_img=False, img_dim=8):
    rng = np.random.RandomState(seed)
    out = []
    for i in range(n):
        L = rng.randint(2, 14)
        Lt = rng.randint(2, 14)
        img = rng.randn(img_dim).astype(np.float32) if with_img else None
        out.append(Example(src=list(rng.randint(4, 50, L)),
                           tgt=list(rng.randint(4, 50, Lt)),
                           img=img, index=i))
    return out


def test_batch_shapes_fixed_and_from_bucket_set():
    exs = _examples(57)
    b = BucketBatcher(exs, batch_size=8, src_buckets=(8, 16))
    shapes = set()
    n_rows = 0
    for batch in b.epoch(0):
        assert batch["src"].shape[0] == 8           # always full batch dim
        assert batch["src"].shape[1] in (8, 16)
        assert batch["tgt_in"].shape == batch["tgt_out"].shape
        shapes.add((batch["src"].shape, batch["tgt_in"].shape))
        n_rows += int(batch["sample_mask"].sum())
    assert n_rows == 57                              # every example exactly once
    assert len(shapes) <= 4                          # small fixed shape set


def test_batch_content_and_masks():
    ex = Example(src=[5, 6, 7], tgt=[10, 11], index=3)
    b = BucketBatcher([ex], batch_size=2, src_buckets=(4,), tgt_buckets=(6,))
    batch = next(iter(b.epoch(0, shuffle=False)))
    np.testing.assert_array_equal(batch["src"][0], [5, 6, 7, PAD_ID])
    np.testing.assert_array_equal(batch["src_mask"][0], [1, 1, 1, 0])
    np.testing.assert_array_equal(batch["tgt_in"][0, :4],
                                  [SOS_ID, 10, 11, PAD_ID])
    np.testing.assert_array_equal(batch["tgt_out"][0, :4],
                                  [10, 11, EOS_ID, PAD_ID])
    np.testing.assert_array_equal(batch["tgt_mask"][0, :4], [1, 1, 1, 0])
    # padded row is fully dead
    assert batch["sample_mask"][1] == 0.0
    assert batch["src_mask"][1].sum() == 0
    assert batch["index"][0] == 3


def test_batcher_epoch_shuffle_is_deterministic_and_varies_by_epoch():
    exs = _examples(40)
    b = BucketBatcher(exs, batch_size=8, src_buckets=(16,), seed=7)
    order0a = [batch["index"].tolist() for batch in b.epoch(0)]
    order0b = [batch["index"].tolist() for batch in b.epoch(0)]
    order1 = [batch["index"].tolist() for batch in b.epoch(1)]
    assert order0a == order0b
    assert order0a != order1


def test_compact_batches_expand_to_classic_keys():
    """compact=True batches (uint16 tokens + lengths) expanded ON DEVICE by
    expand_compact_batch reproduce the classic keys exactly on real rows;
    filler rows differ only where every loss mask is zero."""
    import jax.numpy as jnp

    from vag_nmt_tpu.train.step import expand_compact_batch

    exs = _examples(21, seed=4)                     # 21 % 8 != 0 -> filler rows
    kw = dict(batch_size=8, src_buckets=(8, 16), image_ids=True)
    classic = BucketBatcher(exs, **kw)
    compact = BucketBatcher(exs, **kw, compact=True)
    n = 0
    for cb, kb in zip(compact.epoch(0, shuffle=False),
                      classic.epoch(0, shuffle=False)):
        assert cb["src"].dtype == np.uint16 and cb["tgt"].dtype == np.uint16
        exp = {k: np.asarray(v) for k, v in
               expand_compact_batch({k: jnp.asarray(v)
                                     for k, v in cb.items()}).items()}
        np.testing.assert_array_equal(exp["src"], kb["src"])
        np.testing.assert_array_equal(exp["src_mask"], kb["src_mask"])
        np.testing.assert_array_equal(exp["tgt_mask"], kb["tgt_mask"])
        np.testing.assert_array_equal(exp["sample_mask"], kb["sample_mask"])
        np.testing.assert_array_equal(exp["img_ids"], kb["img_ids"])
        real = kb["sample_mask"] > 0
        np.testing.assert_array_equal(exp["tgt_in"][real], kb["tgt_in"][real])
        np.testing.assert_array_equal(exp["tgt_out"][real], kb["tgt_out"][real])
        # filler rows: every loss term is masked out
        assert (exp["tgt_mask"][~real] == 0).all()
        n += 1
    assert n == classic.num_batches()


def test_compact_batch_no_target_rows_have_zero_loss_mask():
    """tgt=None rows (decode-only) must produce all-zero tgt_mask after
    expansion, exactly like the classic path — regression for the -1
    tgt_len sentinel (tl=0 used to give them a live EOS position)."""
    import jax.numpy as jnp

    from vag_nmt_tpu.train.step import expand_compact_batch

    exs = [Example(src=[5, 6, 7], tgt=None, index=0),
           Example(src=[8, 9], tgt=[10, 11], index=1)]
    kw = dict(batch_size=2, src_buckets=(8,))
    classic = next(iter(BucketBatcher(exs, **kw).epoch(0, shuffle=False)))
    cb = next(iter(BucketBatcher(exs, **kw, compact=True)
                   .epoch(0, shuffle=False)))
    assert cb["tgt_len"][0] == -1 and cb["tgt_len"][1] == 2
    exp = {k: np.asarray(v) for k, v in
           expand_compact_batch({k: jnp.asarray(v)
                                 for k, v in cb.items()}).items()}
    np.testing.assert_array_equal(exp["tgt_mask"], classic["tgt_mask"])
    assert (exp["tgt_mask"][0] == 0).all()
    assert exp["tgt_mask"][1].sum() == 3          # 2 tokens + EOS


def test_compact_batches_reject_oversized_vocab():
    big = [Example(src=[70000], tgt=[5], index=0)]
    with pytest.raises(ValueError, match="65536"):
        BucketBatcher(big, batch_size=1, src_buckets=(8,), compact=True)


def test_compact_train_step_matches_classic(tmp_path):
    """One jitted train step fed compact batches ≡ fed classic batches
    (same weights in, same weights out)."""
    import jax

    from vag_nmt_tpu.core.config import preset
    from vag_nmt_tpu.train.state import create_train_state
    from vag_nmt_tpu.train.step import make_train_step

    cfg = preset("toy")
    exs = _examples(16, seed=5, with_img=True,
                    img_dim=cfg.model.img_feat_dim)
    for ex in exs:
        ex.img = None                                # table path carries ids
    kw = dict(batch_size=8, src_buckets=(8, 16), image_ids=True,
              img_dim=cfg.model.img_feat_dim)
    rng = np.random.RandomState(0)
    table = jax.device_put(
        rng.randn(len(exs), cfg.model.img_feat_dim).astype(np.float32))
    results = []
    for compact in (False, True):
        b = BucketBatcher(exs, **kw, compact=compact)
        state = create_train_state(jax.random.key(1), cfg)
        example = next(iter(b.epoch(0, shuffle=False)))
        step_fn, _ = make_train_step(cfg, None, state, example,
                                     with_img_table=True)
        for batch in b.epoch(0, shuffle=False):
            state, aux = step_fn(state, batch, jax.random.key(2), table)
        results.append(jax.device_get(state.params))
    for x, y in zip(*(jax.tree.leaves(r) for r in results)):
        np.testing.assert_allclose(x, y, rtol=1e-6, atol=1e-7)


def test_pack_unpack_roundtrip_inside_jit():
    import jax
    import jax.numpy as jnp

    from vag_nmt_tpu.data.packing import pack_batch, unpack_batch

    exs = _examples(21, seed=8)
    b = BucketBatcher(exs, batch_size=8, src_buckets=(8, 16), compact=True)
    for batch in b.epoch_stacked(0, 3):
        buf, spec = pack_batch(batch)
        assert buf.dtype == np.uint8

        @jax.jit
        def rt(x, spec=spec):
            return unpack_batch(x, spec)

        out = rt(buf)
        assert sorted(out) == sorted(batch)
        for k in batch:
            got = np.asarray(out[k])
            assert got.dtype == batch[k].dtype, k
            np.testing.assert_array_equal(got, batch[k])


def test_packed_step_matches_classic_step():
    """make_packed_step (single + multi) is numerically identical to the
    per-leaf-fed step fns."""
    import jax

    from vag_nmt_tpu.core.config import preset
    from vag_nmt_tpu.data.packing import pack_batch
    from vag_nmt_tpu.train.state import create_train_state
    from vag_nmt_tpu.train.step import (
        make_multi_step,
        make_packed_step,
        make_train_step,
    )

    cfg = preset("toy").replace(model=dict(multimodal=False))
    exs = _examples(48, seed=9)
    b = BucketBatcher(exs, batch_size=8, src_buckets=(8, 16), compact=True)
    by_shape = {}
    for bb in b.epoch(0, shuffle=False):
        by_shape.setdefault(bb["src"].shape + bb["tgt"].shape, []).append(bb)
    batches = next(v for v in by_shape.values() if len(v) >= 2)[:2]
    stack = {k: np.stack([bb[k] for bb in batches]) for k in batches[0]}
    rng = jax.random.key(3)

    s1 = create_train_state(jax.random.key(0), cfg)
    step_fn, _ = make_train_step(cfg)
    for bb in batches:
        s1, _ = step_fn(s1, bb, rng)

    s2 = create_train_state(jax.random.key(0), cfg)
    pm = make_packed_step(cfg, multi=True)
    buf, spec = pack_batch(stack)
    s2, aux = pm(s2, buf, rng, spec=spec)

    s3 = create_train_state(jax.random.key(0), cfg)
    ps = make_packed_step(cfg, multi=False)
    for bb in batches:
        bu, sp = pack_batch(bb)
        s3, _ = ps(s3, bu, rng, spec=sp)

    for a, b2, c in zip(jax.tree.leaves(jax.device_get(s1.params)),
                        jax.tree.leaves(jax.device_get(s2.params)),
                        jax.tree.leaves(jax.device_get(s3.params))):
        np.testing.assert_allclose(a, b2, rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(a, c, rtol=1e-6, atol=1e-7)


def test_epoch_stacked_covers_every_example_once():
    """K-deep stacking must visit each example exactly once per epoch and
    produce only same-shape stacks (+ leftover singles)."""
    exs = _examples(57, seed=6)
    b = BucketBatcher(exs, batch_size=8, src_buckets=(8, 16), compact=True)
    n_rows = 0
    for batch in b.epoch_stacked(0, 4):
        if batch["src"].ndim == 3:
            assert batch["src"].shape[0] == 4
            n_rows += int(batch["sample_mask"].sum())
        else:
            n_rows += int(batch["sample_mask"].sum())
    assert n_rows == 57
    # k=1 must be the plain epoch
    plain = [x["src"].tobytes() for x in b.epoch(0)]
    k1 = [x["src"].tobytes() for x in b.epoch_stacked(0, 1)]
    assert plain == k1


def test_batcher_includes_images_when_asked():
    exs = _examples(5, with_img=True, img_dim=8)
    b = BucketBatcher(exs, batch_size=4, src_buckets=(16,),
                      include_image=True, img_dim=8)
    batch = next(iter(b.epoch(0, shuffle=False)))
    assert batch["img"].shape == (4, 8)
    assert np.abs(batch["img"][:3]).sum() > 0


# ---------------------------------------------------------------------------
# Feature alignment (SURVEY.md §3.4 silent-corruption hazard)
# ---------------------------------------------------------------------------

def test_feature_alignment_checks(tmp_path):
    feats = np.random.RandomState(0).randn(3, 4).astype(np.float32)
    lines = ["a b", "c d", "e f"]
    p = str(tmp_path / "f.npy")
    save_features(p, feats, corpus_lines=lines)
    got = load_features(p, expected_rows=3, corpus_lines=lines)
    np.testing.assert_allclose(np.asarray(got), feats)
    with pytest.raises(ValueError):
        load_features(p, expected_rows=2)
    with pytest.raises(ValueError):
        load_features(p, expected_rows=3, corpus_lines=["x", "y", "z"])


def test_incremental_bpe_learner_matches_naive_rescan():
    """learn_bpe's incremental pair-stat/heap implementation must produce the
    EXACT merge sequence of the naive full-rescan algorithm (same
    deterministic tie-break: max count, then lexicographically largest)."""
    import random
    from collections import Counter

    from vag_nmt_tpu.data.bpe import _word_symbols, learn_bpe

    def naive(word_freqs, num_merges):
        vocab = {_word_symbols(w): f for w, f in word_freqs.items() if w}
        merges = []
        for _ in range(num_merges):
            pairs = Counter()
            for syms, freq in vocab.items():
                for a, b in zip(syms, syms[1:]):
                    pairs[(a, b)] += freq
            if not pairs:
                break
            best = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))[0]
            if pairs[best] < 2:
                break
            merges.append(best)
            new_vocab = {}
            for syms, freq in vocab.items():
                out, i = [], 0
                while i < len(syms):
                    if (i + 1 < len(syms) and syms[i] == best[0]
                            and syms[i + 1] == best[1]):
                        out.append(best[0] + best[1])
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + freq
            vocab = new_vocab
        return merges

    rng = random.Random(7)
    for _ in range(3):
        types = ["".join(rng.choice("abcdefg")
                         for _ in range(rng.randint(1, 8)))
                 for _ in range(200)]
        freqs = Counter(rng.choice(types) for _ in range(3000))
        assert learn_bpe(dict(freqs), 150) == naive(dict(freqs), 150)


def test_pack_leaves_roundtrip():
    """Device-side output packing (one-fetch transport) must reproduce every
    leaf bit-for-bit through the uint8 buffer."""
    import jax.numpy as jnp

    from vag_nmt_tpu.data.packing import (
        leaves_spec,
        pack_leaves,
        unpack_leaves_host,
    )

    rng = np.random.RandomState(0)
    leaves = [
        rng.randint(0, 60000, (3, 5, 7)).astype(np.uint16),
        rng.randint(-2**31, 2**31 - 1, (4, 2)).astype(np.int32),
        rng.randn(2, 3).astype(np.float32),
    ]
    buf = np.asarray(pack_leaves([jnp.asarray(a) for a in leaves]))
    assert buf.dtype == np.uint8 and buf.ndim == 1
    spec = leaves_spec([(a.dtype, a.shape) for a in leaves])
    out = unpack_leaves_host(buf, spec)
    for a, b in zip(leaves, out):
        np.testing.assert_array_equal(a, b)

    with pytest.raises(ValueError, match="consumed"):
        unpack_leaves_host(buf[:-1], spec)


def test_save_features_sidecar_follows_npy_suffix(tmp_path):
    """np.save appends '.npy' when absent; the alignment sidecar must sit
    next to the file actually written or the checksum silently never runs
    (review finding)."""
    import numpy as np

    from vag_nmt_tpu.data.features import load_features, save_features

    feats = np.arange(6, dtype=np.float32).reshape(3, 2)
    lines = ["a", "b", "c"]
    save_features(str(tmp_path / "f"), feats, lines)          # no .npy
    assert (tmp_path / "f.npy.align.json").exists()
    load_features(str(tmp_path / "f.npy"), 3, lines)          # checksum runs
    import pytest

    with pytest.raises(ValueError, match="corpus"):
        load_features(str(tmp_path / "f.npy"), 3, ["a", "c", "b"])
