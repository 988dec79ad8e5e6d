"""Corpus translation paths (SURVEY.md C12/§3.2): the fused single-dispatch
corpus decode must produce exactly the hypotheses of the per-bucket path, and
bf16 decode must stay well-formed."""

import jax
import numpy as np
import pytest

from vag_nmt_tpu.core.config import preset
from vag_nmt_tpu.data.batching import Example
from vag_nmt_tpu.data.vocab import Vocab
from vag_nmt_tpu.decode.translate import translate_corpus
from vag_nmt_tpu.models import init_params


@pytest.fixture(scope="module")
def setup():
    cfg = preset("toy")
    m = cfg.model
    params = init_params(jax.random.key(0), m)
    rng = np.random.RandomState(7)
    examples = []
    for i in range(37):          # deliberately not a multiple of batch size
        L = int(rng.randint(3, 14))
        examples.append(Example(
            src=list(rng.randint(4, m.src_vocab_size, L)),
            img=rng.randn(m.img_feat_dim).astype(np.float32),
            index=i,
        ))
    vocab = Vocab(["<pad>", "<unk>", "<sos>", "<eos>"]
                  + [f"t{i}" for i in range(m.tgt_vocab_size - 4)])
    return cfg, params, examples, vocab


def test_fused_matches_bucketed_path(setup):
    cfg, params, examples, vocab = setup
    hyp_fused, st_fused = translate_corpus(params, cfg, examples, vocab,
                                           fused=True)
    hyp_bucket, _ = translate_corpus(params, cfg, examples, vocab, fused=False)
    assert st_fused["sentences"] == len(examples)
    assert hyp_fused == hyp_bucket


def test_fused_greedy_matches_bucketed_path(setup):
    cfg, params, examples, vocab = setup
    h1, _ = translate_corpus(params, cfg, examples, vocab, beam_size=1,
                             fused=True)
    h2, _ = translate_corpus(params, cfg, examples, vocab, beam_size=1,
                             fused=False)
    assert h1 == h2


def test_nbest_first_entry_matches_best_and_scores_descend(setup):
    cfg, params, examples, vocab = setup
    best, _ = translate_corpus(params, cfg, examples, vocab, beam_size=3)
    lists, st = translate_corpus(params, cfg, examples, vocab, beam_size=3,
                                 nbest=3)
    assert st["sentences"] == len(examples)
    assert len(lists) == len(examples)
    for i, cands in enumerate(lists):
        assert 1 <= len(cands) <= 3
        assert cands[0][0] == best[i]
        scores = [s for _, s in cands]
        assert scores == sorted(scores, reverse=True)


def test_empty_corpus_returns_empty_even_with_mesh(setup):
    from vag_nmt_tpu.parallel.sharding import make_mesh

    cfg, params, _, vocab = setup
    mesh = make_mesh(n_data=8, n_model=1)
    hyps, st = translate_corpus(params, cfg, [], vocab, mesh=mesh)
    assert hyps == [] and st["sentences"] == 0


def test_beam_loop_steps_consistent_and_covers_all_beams(setup):
    """beam_loop_steps is the realized trip count (max over ALL beams), so
    the 1-best and n-best paths must agree on it and it must be >= the
    longest best hypothesis."""
    cfg, params, examples, vocab = setup
    hyps, st1 = translate_corpus(params, cfg, examples, vocab, beam_size=3)
    _, stn = translate_corpus(params, cfg, examples, vocab, beam_size=3,
                              nbest=3)
    assert st1["beam_loop_steps"] == stn["beam_loop_steps"]
    longest_best = max(len(h.split()) for h in hyps)
    assert st1["beam_loop_steps"] >= longest_best


def test_nbest_requires_beam_and_fused(setup):
    cfg, params, examples, vocab = setup
    with pytest.raises(ValueError, match="beam"):
        translate_corpus(params, cfg, examples, vocab, beam_size=1, nbest=2)
    with pytest.raises(ValueError, match="fused"):
        translate_corpus(params, cfg, examples, vocab, beam_size=3, nbest=2,
                         fused=False)


def test_text_only_fused_matches_bucketed(setup):
    cfg, params, examples, vocab = setup
    cfg_txt = cfg.replace(model=dict(multimodal=False))
    params_txt = init_params(jax.random.key(1), cfg_txt.model)
    ex_txt = [Example(src=e.src, index=e.index) for e in examples]
    h1, _ = translate_corpus(params_txt, cfg_txt, ex_txt, vocab, fused=True)
    h2, _ = translate_corpus(params_txt, cfg_txt, ex_txt, vocab, fused=False)
    assert h1 == h2


def test_bf16_decode_wellformed(setup):
    cfg, params, examples, vocab = setup
    # decode.compute_dtype must ALSO be bf16: the decode-side default is
    # fp32 (measured faster on TPU), which would silently un-bf16 this test
    cfg_bf = cfg.replace(model=dict(compute_dtype="bfloat16"),
                         decode=dict(compute_dtype="bfloat16"))
    hyps, stats = translate_corpus(params, cfg_bf, examples, vocab)
    assert len(hyps) == len(examples)
    # all output units must be real vocab entries (no pads/specials leaking)
    for h in hyps:
        for u in h.split():
            assert u in vocab.stoi, u


def test_sliced_examples_with_stale_indices(setup):
    """A slice keeping original .index values must decode in LIST order on
    both paths (the bucketed path used to scatter by .index and crash)."""
    cfg, params, examples, vocab = setup
    sl = examples[10:30]                      # .index values 10..29
    h_f, _ = translate_corpus(params, cfg, sl, vocab, fused=True)
    h_b, _ = translate_corpus(params, cfg, sl, vocab, fused=False)
    assert h_f == h_b and len(h_f) == 20
    full, _ = translate_corpus(params, cfg, examples, vocab, fused=True)
    assert h_f == full[10:30]


def test_img_table_allows_examples_without_img(setup):
    """With a caller-built device table, examples may carry img=None."""
    from vag_nmt_tpu.data.batching import Example
    from vag_nmt_tpu.decode.translate import build_img_table

    cfg, params, examples, vocab = setup
    tbl = build_img_table(examples, cfg.model.img_feat_dim)
    bare = [Example(src=e.src, index=i) for i, e in enumerate(examples)]
    h_tbl, _ = translate_corpus(params, cfg, bare, vocab, img_table=tbl)
    h_ref, _ = translate_corpus(params, cfg, examples, vocab)
    assert h_tbl == h_ref
    h_tbl_b, _ = translate_corpus(params, cfg, bare, vocab, img_table=tbl,
                                  fused=False)
    assert h_tbl_b == h_ref


def test_multimodal_without_features_raises(setup):
    from vag_nmt_tpu.data.batching import Example

    cfg, params, examples, vocab = setup
    bare = [Example(src=e.src, index=i) for i, e in enumerate(examples)]
    import pytest as _pytest
    with _pytest.raises(ValueError, match="features"):
        translate_corpus(params, cfg, bare, vocab)


def test_mesh_sharded_decode_matches_single_device(setup):
    """Fused corpus decode over an 8-virtual-device 'data' mesh produces
    EXACTLY the single-device hypotheses (VERDICT r1 item 5)."""
    from vag_nmt_tpu.parallel.sharding import make_mesh

    cfg, params, examples, vocab = setup
    mesh = make_mesh(n_data=8, n_model=1)
    h_1, _ = translate_corpus(params, cfg, examples, vocab, fused=True)
    h_m, st = translate_corpus(params, cfg, examples, vocab, fused=True,
                               mesh=mesh)
    assert h_m == h_1
    assert st["sentences"] == len(examples)


def test_mesh_sharded_decode_pallas_encoder_matches_single_device(setup):
    """Mesh decode with the shard_map'ed Pallas GRU encoder (gru_impl=
    'pallas', interpret mode on CPU) ≡ single-device XLA hypotheses."""
    from vag_nmt_tpu.parallel.sharding import make_mesh

    cfg, params, examples, vocab = setup
    mesh = make_mesh(n_data=8, n_model=1)
    h_1, _ = translate_corpus(params, cfg, examples, vocab, fused=True)
    cfg_p = cfg.replace(model=dict(gru_impl="pallas"))
    h_m, _ = translate_corpus(params, cfg_p, examples, vocab, fused=True,
                              mesh=mesh)
    assert h_m == h_1


def test_mesh_sharded_decode_rounds_batch_up(setup):
    """decode_batch_size not divisible by the data axis is rounded up."""
    from vag_nmt_tpu.parallel.sharding import make_mesh

    cfg, params, examples, vocab = setup
    cfg = cfg.replace(decode=dict(decode_batch_size=12))   # 12 % 8 != 0
    mesh = make_mesh(n_data=8, n_model=1)
    h_1, _ = translate_corpus(params, cfg, examples, vocab, fused=True)
    h_m, _ = translate_corpus(params, cfg, examples, vocab, fused=True,
                              mesh=mesh)
    assert h_m == h_1


def test_mesh_requires_fused_path(setup):
    from vag_nmt_tpu.parallel.sharding import make_mesh

    cfg, params, examples, vocab = setup
    with pytest.raises(ValueError, match="fused"):
        translate_corpus(params, cfg, examples, vocab, fused=False,
                         mesh=make_mesh(n_data=8, n_model=1))


def test_tp_mesh_decode_matches_single_device(setup):
    """Vocab-sharded (TP) params on a (4,2) mesh decode to exactly the
    single-device hypotheses (GSPMD inserts the vocab collectives)."""
    from vag_nmt_tpu.parallel.sharding import make_mesh, param_shardings

    cfg, params, examples, vocab = setup
    h_1, _ = translate_corpus(params, cfg, examples, vocab, fused=True)
    mesh = make_mesh(n_data=4, n_model=2)
    params_tp = jax.device_put(params, param_shardings(mesh, params))
    h_tp, _ = translate_corpus(params_tp, cfg, examples, vocab, fused=True,
                               mesh=mesh)
    assert h_tp == h_1


def test_token_tables_fused_corpus_matches(setup, monkeypatch):
    """VAG_TOKEN_TABLES=on (the TPU default; per-vocab gate/readout tables
    gathered per step) must produce the same hypotheses as the untabled
    path through the REAL fused corpus program, beam and greedy."""
    cfg, params, examples, vocab = setup
    for beam in (3, 1):
        monkeypatch.setenv("VAG_TOKEN_TABLES", "off")
        h_off, _ = translate_corpus(params, cfg, examples, vocab,
                                    beam_size=beam)
        monkeypatch.setenv("VAG_TOKEN_TABLES", "on")
        h_on, _ = translate_corpus(params, cfg, examples, vocab,
                                   beam_size=beam)
        assert h_on == h_off


def test_two_phase_fused_corpus_matches(setup, monkeypatch):
    """VAG_TWO_PHASE=on (straggler-compacted decode) must reproduce the
    default chunked fused decode exactly, including nbest lists, and must
    report the phase-2 accounting fields."""
    cfg, params, examples, vocab = setup
    monkeypatch.setenv("VAG_TWO_PHASE", "off")
    ref, st_ref = translate_corpus(params, cfg, examples, vocab, beam_size=3)
    ref_n, _ = translate_corpus(params, cfg, examples, vocab, beam_size=3,
                                nbest=3)
    monkeypatch.setenv("VAG_TWO_PHASE", "on")
    hyp, st = translate_corpus(params, cfg, examples, vocab, beam_size=3)
    hyp_n, _ = translate_corpus(params, cfg, examples, vocab, beam_size=3,
                                nbest=3)
    assert hyp == ref
    assert hyp_n == ref_n
    assert st["two_phase"] is True
    assert "phase2_steps" in st and len(st["phase2_steps"]) >= 1
    # phase-1 trips are capped at the auto split length max(16, max_len//4)
    L1 = max(16, cfg.decode.max_len // 4)
    assert all(s <= L1 for s in st["chunk_steps"])
    assert st["beam_loop_steps"] == (sum(st["chunk_steps"])
                                     + sum(st["phase2_steps"]))
    # greedy ignores the knob (two-phase is beam-only)
    g_ref, _ = translate_corpus(params, cfg, examples, vocab, beam_size=1)
    assert "two_phase" not in _


def test_two_phase_policy_resolution(monkeypatch):
    """_use_two_phase: env > cfg; greedy and TP meshes force it off, a
    pure-DP mesh composes (per-shard re-pack)."""
    from vag_nmt_tpu.core.config import preset
    from vag_nmt_tpu.decode.translate import _use_two_phase
    from vag_nmt_tpu.parallel.sharding import make_mesh

    cfg = preset("toy")
    monkeypatch.delenv("VAG_TWO_PHASE", raising=False)
    assert _use_two_phase(cfg, 5, 128, None) is True      # auto, long
    assert _use_two_phase(cfg, 5, 64, None) is False      # auto, short
    assert _use_two_phase(cfg, 1, 128, None) is False     # greedy
    assert _use_two_phase(                                 # DP mesh: on
        cfg, 5, 128, make_mesh(n_data=8, n_model=1)) is True
    assert _use_two_phase(                                 # TP mesh: off
        cfg, 5, 128, make_mesh(n_data=4, n_model=2)) is False
    on = cfg.replace(decode=dict(two_phase="on"))
    off = cfg.replace(decode=dict(two_phase="off"))
    assert _use_two_phase(on, 5, 8, None) is True
    assert _use_two_phase(off, 5, 128, None) is False
    monkeypatch.setenv("VAG_TWO_PHASE", "off")
    assert _use_two_phase(on, 5, 128, None) is False
    monkeypatch.setenv("VAG_TWO_PHASE", "on")
    assert _use_two_phase(off, 5, 8, None) is True


def test_two_phase_nbest_eos_top_matches(setup, monkeypatch):
    """nbest lists under eos_top are identical with and without the
    two-phase compaction (exactness holds per termination semantic)."""
    cfg, params, examples, vocab = setup
    cfg = cfg.replace(decode=dict(beam_finish="eos_top"))
    monkeypatch.setenv("VAG_TWO_PHASE", "off")
    ref, _ = translate_corpus(params, cfg, examples, vocab, beam_size=3,
                              nbest=3)
    monkeypatch.setenv("VAG_TWO_PHASE", "on")
    out, st = translate_corpus(params, cfg, examples, vocab, beam_size=3,
                               nbest=3)
    assert out == ref
    assert st["two_phase"] is True


def test_streaming_fused_corpus_matches(setup, monkeypatch):
    """VAG_STREAM_DECODE=on (continuous-batching refill decode) reproduces
    the chunked fused decode exactly, including nbest, and reports the
    streaming accounting fields."""
    cfg, params, examples, vocab = setup
    monkeypatch.setenv("VAG_STREAM_DECODE", "off")
    ref, st_ref = translate_corpus(params, cfg, examples, vocab, beam_size=3)
    ref_n, _ = translate_corpus(params, cfg, examples, vocab, beam_size=3,
                                nbest=3)
    monkeypatch.setenv("VAG_STREAM_DECODE", "on")
    hyp, st = translate_corpus(params, cfg, examples, vocab, beam_size=3)
    hyp_n, _ = translate_corpus(params, cfg, examples, vocab, beam_size=3,
                                nbest=3)
    assert hyp == ref
    assert hyp_n == ref_n
    assert st["streaming"] is True
    assert len(st["refills"]) >= 1
    # the accounting fields are present and sane (streaming can do a few
    # MORE slot-steps than the chunked loops on tiny corpora: refill
    # hysteresis lets finished rows ride, and the drain tail has no chunk
    # boundary to exit at — the win appears when n_chunks is large)
    assert st["beam_loop_steps"] > 0


def test_mesh_two_phase_matches_single_device(setup, monkeypatch):
    """Mesh + two-phase (VERDICT r3 item 5): the per-shard re-pack (each
    device compacts its own rows via shard_map over 'data') produces
    EXACTLY the single-device two-phase hypotheses — and those equal the
    plain chunked decode (exactness is packing-independent), incl. nbest
    lists. Accounting fields must survive the mesh path."""
    from vag_nmt_tpu.parallel.sharding import make_mesh

    cfg, params, examples, vocab = setup
    mesh = make_mesh(n_data=8, n_model=1)
    monkeypatch.setenv("VAG_TWO_PHASE", "off")
    ref, _ = translate_corpus(params, cfg, examples, vocab, beam_size=3)
    monkeypatch.setenv("VAG_TWO_PHASE", "on")
    h_1, st_1 = translate_corpus(params, cfg, examples, vocab, beam_size=3)
    h_m, st_m = translate_corpus(params, cfg, examples, vocab, beam_size=3,
                                 mesh=mesh)
    n_1, _ = translate_corpus(params, cfg, examples, vocab, beam_size=3,
                              nbest=3)
    n_m, _ = translate_corpus(params, cfg, examples, vocab, beam_size=3,
                              nbest=3, mesh=mesh)
    assert h_m == h_1 == ref
    assert n_m == n_1
    assert st_m["two_phase"] is True and st_1["two_phase"] is True
    # pmax'ed trip stats: wall-clock trips of the slowest shard, so the
    # mesh per-chunk phase-1 trips are bounded by the single-device cap
    L1 = max(16, cfg.decode.max_len // 4)
    assert all(s <= L1 for s in st_m["chunk_steps"])
    assert st_m["beam_loop_steps"] > 0


def test_mesh_streaming_matches_single_device(setup, monkeypatch):
    """Mesh + streaming-refill decode via the same per-shard re-pack:
    hypotheses identical to single-device streaming and to the plain
    chunked decode."""
    from vag_nmt_tpu.parallel.sharding import make_mesh

    cfg, params, examples, vocab = setup
    mesh = make_mesh(n_data=8, n_model=1)
    monkeypatch.setenv("VAG_STREAM_DECODE", "off")
    ref, _ = translate_corpus(params, cfg, examples, vocab, beam_size=3)
    monkeypatch.setenv("VAG_STREAM_DECODE", "on")
    h_1, _ = translate_corpus(params, cfg, examples, vocab, beam_size=3)
    h_m, st_m = translate_corpus(params, cfg, examples, vocab, beam_size=3,
                                 mesh=mesh)
    assert h_m == h_1 == ref
    assert st_m["streaming"] is True


def test_mesh_two_phase_pallas_encoder_matches(setup, monkeypatch):
    """Mesh + two-phase with the Pallas GRU encoder (interpret mode on
    CPU): inside the per-shard re-pack the kernel runs its plain local
    path (batch rows are already device-local), and hypotheses still match
    the single-device XLA decode."""
    from vag_nmt_tpu.parallel.sharding import make_mesh

    cfg, params, examples, vocab = setup
    mesh = make_mesh(n_data=8, n_model=1)
    monkeypatch.setenv("VAG_TWO_PHASE", "on")
    h_1, _ = translate_corpus(params, cfg, examples, vocab, beam_size=3)
    cfg_p = cfg.replace(model=dict(gru_impl="pallas"))
    h_m, _ = translate_corpus(params, cfg_p, examples, vocab, beam_size=3,
                              mesh=mesh)
    assert h_m == h_1


def test_decode_compute_dtype_resolution(setup):
    """decode.compute_dtype overrides the model dtype for decode programs:
    a bf16-model config with the fp32 decode default must produce the SAME
    hypotheses as a plain fp32 config (the decode-side cast is resolved
    once at translate_corpus entry), while an explicit bf16 decode keeps
    bf16 numerics (wellformed, but a distinct program)."""
    cfg, params, examples, vocab = setup
    sl = examples[:24]
    base, _ = translate_corpus(params, cfg, sl, vocab)  # fp32 everywhere

    cfg_bf_model = cfg.replace(model=dict(compute_dtype="bfloat16"))
    # decode.compute_dtype default "float32" wins over the bf16 model dtype
    h_fp32_decode, _ = translate_corpus(params, cfg_bf_model, sl, vocab)
    assert h_fp32_decode == base

    cfg_inherit = cfg_bf_model.replace(decode=dict(compute_dtype=""))
    h_bf16, _ = translate_corpus(params, cfg_inherit, sl, vocab)
    assert len(h_bf16) == len(sl)  # bf16 program runs; numerics may differ
