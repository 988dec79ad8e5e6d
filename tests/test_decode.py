"""Beam-search properties (SURVEY.md §4): beam=1 ≡ greedy, monotone scores,
finished-hypothesis freezing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vag_nmt_tpu.core.config import EOS_ID, PAD_ID, preset
from vag_nmt_tpu.decode import beam_search, greedy_decode
from vag_nmt_tpu.models import init_params, prepare_decode

from tests.test_models import make_batch


@pytest.fixture(scope="module")
def setup():
    cfg = preset("toy")
    m = cfg.model
    params = init_params(jax.random.key(0), m)
    batch = make_batch(cfg, B=6, T=8, seed=3)
    state = prepare_decode(params, m, batch)
    return params, m, state


def test_beam1_equals_greedy(setup):
    params, m, state = setup
    g_toks, g_lens = greedy_decode(params, m, state, max_len=12)
    res = beam_search(params, m, state, beam_size=1, max_len=12)
    np.testing.assert_array_equal(np.asarray(res.best_tokens),
                                  np.asarray(g_toks))
    np.testing.assert_array_equal(np.asarray(res.best_lengths),
                                  np.asarray(g_lens))


def test_beam_scores_descending(setup):
    params, m, state = setup
    res = beam_search(params, m, state, beam_size=4, max_len=12)
    s = np.asarray(res.scores)
    assert np.all(np.diff(s, axis=1) <= 1e-6)


def test_beam_scores_match_teacher_forced_rescoring(setup):
    """Every hypothesis's reported score must equal the model's actual
    log-probability of that token sequence (validates all beam bookkeeping:
    state gathers, history gathers, finished freezing)."""
    params, m, state = setup
    from vag_nmt_tpu.models import decode_step

    res = beam_search(params, m, state, beam_size=3, max_len=10,
                      length_norm_alpha=0.0)
    toks = np.asarray(res.tokens)      # (B, K, L)
    lens = np.asarray(res.lengths)
    B, K, L = toks.shape

    # Re-score by stepping the decoder with teacher forcing, per hypothesis
    # (decode_step takes a (B, K) beam axis; use K=1 here).
    for k in range(K):
        tok = jnp.full((B,), 2, jnp.int32)  # sos
        s = state.s0[:, None, :]
        total = np.zeros(B)
        for t in range(L):
            s, logits = decode_step(params, m, tok[:, None], s, state)
            logp = np.asarray(jax.nn.log_softmax(logits[:, 0], -1))
            step_tok = toks[:, k, t]
            live = t < lens[:, k]
            total += np.where(live, logp[np.arange(B), step_tok], 0.0)
            tok = jnp.asarray(step_tok)
        np.testing.assert_allclose(np.asarray(res.scores[:, k]), total,
                                   rtol=2e-4, atol=2e-4)


def test_beam_output_wellformed(setup):
    params, m, state = setup
    res = beam_search(params, m, state, beam_size=3, max_len=10)
    toks = np.asarray(res.tokens)
    lens = np.asarray(res.lengths)
    B, K, L = toks.shape
    assert (lens >= 1).all() and (lens <= 10).all()
    for b in range(B):
        for k in range(K):
            hyp = toks[b, k]
            n = lens[b, k]
            # after the hypothesis length: all pad
            assert (hyp[n:] == PAD_ID).all()
            # an EOS, if present, is the last real token
            eos_pos = np.where(hyp == EOS_ID)[0]
            if len(eos_pos):
                assert eos_pos[0] == n - 1


def test_greedy_tokens_match_manual_argmax_rollout(setup):
    params, m, state = setup
    from vag_nmt_tpu.models import decode_step

    toks, lens = greedy_decode(params, m, state, max_len=8)
    B = state.s0.shape[0]
    tok = jnp.full((B,), 2, jnp.int32)
    s = state.s0[:, None, :]
    finished = np.zeros(B, bool)
    for t in range(8):
        s, logits = decode_step(params, m, tok[:, None], s, state)
        nxt = np.asarray(jnp.argmax(logits[:, 0], -1)).astype(np.int32)
        nxt = np.where(finished, PAD_ID, nxt)
        np.testing.assert_array_equal(np.asarray(toks[:, t]), nxt)
        finished |= nxt == EOS_ID
        tok = jnp.asarray(nxt)


def test_fused_readout_topk_beam_matches_unfused(setup, monkeypatch):
    """Full beam search through the fused readout+top-k kernel (interpret
    mode off-TPU) must produce the same hypotheses/lengths as the unfused
    logits + beam_topk path, and near-identical scores."""
    params, m, state = setup
    monkeypatch.setenv("VAG_READOUT_TOPK", "unfused")
    ref = beam_search(params, m, state, beam_size=3, max_len=12)
    monkeypatch.setenv("VAG_READOUT_TOPK", "fused")
    fused = beam_search(params, m, state, beam_size=3, max_len=12)
    np.testing.assert_array_equal(np.asarray(fused.tokens),
                                  np.asarray(ref.tokens))
    np.testing.assert_array_equal(np.asarray(fused.lengths),
                                  np.asarray(ref.lengths))
    np.testing.assert_allclose(np.asarray(fused.scores),
                               np.asarray(ref.scores), rtol=1e-5, atol=1e-5)


def test_deferred_exactness_beam_matches(setup, monkeypatch):
    """Chunk-level deferred exactness (VAG_FRT_DEFER=1, the default when
    the fused kernel runs at slot depth < K): hypotheses/lengths/scores
    must match the per-step-cond fused path and the unfused oracle at K=5,
    including at slot depth 1 where the watermark fires often on random
    data (exercising the whole-chunk exact rerun statistically)."""
    params, m, state = setup
    monkeypatch.setenv("VAG_READOUT_TOPK", "unfused")
    ref = beam_search(params, m, state, beam_size=5, max_len=12)
    monkeypatch.setenv("VAG_READOUT_TOPK", "fused")
    for slots in ("", "1"):
        if slots:
            monkeypatch.setenv("VAG_FRT_SLOTS", slots)
        monkeypatch.setenv("VAG_FRT_DEFER", "1")
        got = beam_search(params, m, state, beam_size=5, max_len=12)
        np.testing.assert_array_equal(np.asarray(got.tokens),
                                      np.asarray(ref.tokens))
        np.testing.assert_array_equal(np.asarray(got.lengths),
                                      np.asarray(ref.lengths))
        np.testing.assert_allclose(np.asarray(got.scores),
                                   np.asarray(ref.scores),
                                   rtol=1e-5, atol=1e-5)


def test_deferred_rerun_branch_is_exact(setup, monkeypatch):
    """Force the violation flag True on every step: the deferred path must
    then return the whole-chunk exact rerun's results, which equal the
    per-step-cond path's (validates the rerun wiring independently of the
    watermark's tiny natural firing probability)."""
    params, m, state = setup
    import vag_nmt_tpu.decode.beam as beam_mod

    orig = beam_mod.decode_step_topk
    monkeypatch.setenv("VAG_READOUT_TOPK", "fused")
    monkeypatch.setenv("VAG_FRT_DEFER", "0")
    ref = beam_search(params, m, state, beam_size=5, max_len=12)

    def always_viol(*a, **kw):
        out = orig(*a, **kw)
        if kw.get("defer_exact"):
            return out[:3] + (jnp.ones((), bool),)
        return out

    monkeypatch.setattr(beam_mod, "decode_step_topk", always_viol)
    monkeypatch.setenv("VAG_FRT_DEFER", "1")
    got = beam_search(params, m, state, beam_size=5, max_len=12)
    np.testing.assert_array_equal(np.asarray(got.tokens),
                                  np.asarray(ref.tokens))
    np.testing.assert_array_equal(np.asarray(got.lengths),
                                  np.asarray(ref.lengths))
    np.testing.assert_allclose(np.asarray(got.scores),
                               np.asarray(ref.scores), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("unroll", [2, 3, 8, 64])
def test_beam_unroll_invariance(setup, unroll):
    """Hypotheses/lengths/scores must be IDENTICAL for any unroll factor
    (finished rows frozen; steps past max_len are exact no-ops)."""
    params, m, state = setup
    ref = beam_search(params, m, state, beam_size=3, max_len=12, unroll=1)
    got = beam_search(params, m, state, beam_size=3, max_len=12,
                      unroll=unroll)
    np.testing.assert_array_equal(np.asarray(got.tokens),
                                  np.asarray(ref.tokens))
    np.testing.assert_array_equal(np.asarray(got.lengths),
                                  np.asarray(ref.lengths))
    np.testing.assert_allclose(np.asarray(got.scores),
                               np.asarray(ref.scores), rtol=1e-6, atol=1e-6)


def test_token_tables_beam_and_greedy_match_untabled(setup):
    """decode_tables turns the per-step embed->matmul chains into gathers;
    the table entries are the SAME f32 matmul outputs computed over the
    whole vocab at once, so beam/greedy results must match the untabled
    path (hypotheses/lengths exactly; scores to fp noise)."""
    params, m, state = setup
    from vag_nmt_tpu.models.decoder import decode_tables

    tables = decode_tables(params["decoder"])
    assert tables["gy"].shape[0] == m.tgt_vocab_size
    assert tables["gy"].shape[1] > 3 * m.dec_hidden_dim

    res = beam_search(params, m, state, beam_size=4, max_len=12)
    res_t = beam_search(params, m, state, beam_size=4, max_len=12,
                        tables=tables)
    np.testing.assert_array_equal(np.asarray(res_t.tokens),
                                  np.asarray(res.tokens))
    np.testing.assert_array_equal(np.asarray(res_t.lengths),
                                  np.asarray(res.lengths))
    np.testing.assert_allclose(np.asarray(res_t.scores),
                               np.asarray(res.scores), atol=1e-5)

    g_toks, g_lens = greedy_decode(params, m, state, max_len=12)
    t_toks, t_lens = greedy_decode(params, m, state, max_len=12,
                                   tables=tables)
    np.testing.assert_array_equal(np.asarray(t_toks), np.asarray(g_toks))
    np.testing.assert_array_equal(np.asarray(t_lens), np.asarray(g_lens))


@pytest.mark.parametrize("split_len", [1, 5, 12])
def test_two_phase_beam_matches_single_loop(setup, split_len):
    """beam_search_two_phase (straggler compaction) is EXACT for any
    split_len and any chunking: the per-step body is row-local, every
    unfinished row leaves phase 1 at exactly t = split_len, and frozen
    rows are no-ops wherever they ride — so re-packed resume reproduces
    the single-loop result bit for bit (tokens/lengths exactly, scores
    to 0)."""
    from vag_nmt_tpu.decode.beam import beam_search_two_phase

    params, m, state = setup
    ref = beam_search(params, m, state, beam_size=3, max_len=12)
    res, steps1, steps2 = beam_search_two_phase(
        params, m, state, beam_size=3, max_len=12, chunk=2,
        split_len=split_len)
    np.testing.assert_array_equal(np.asarray(res.tokens),
                                  np.asarray(ref.tokens))
    np.testing.assert_array_equal(np.asarray(res.lengths),
                                  np.asarray(ref.lengths))
    np.testing.assert_array_equal(np.asarray(res.scores),
                                  np.asarray(ref.scores))
    s1 = np.asarray(steps1)
    assert s1.shape == (3,) and (s1 <= split_len).all()
    if split_len >= 12:
        assert int(steps2) == 0


def test_two_phase_with_tables_matches(setup):
    from vag_nmt_tpu.decode.beam import beam_search_two_phase
    from vag_nmt_tpu.models.decoder import decode_tables

    params, m, state = setup
    tables = decode_tables(params["decoder"])
    ref = beam_search(params, m, state, beam_size=4, max_len=12,
                      tables=tables)
    res, _, _ = beam_search_two_phase(
        params, m, state, beam_size=4, max_len=12, chunk=3, split_len=4,
        tables=tables)
    np.testing.assert_array_equal(np.asarray(res.tokens),
                                  np.asarray(ref.tokens))
    np.testing.assert_array_equal(np.asarray(res.scores),
                                  np.asarray(ref.scores))


def test_eos_top_termination(setup):
    """beam_finish="eos_top": the sentence stops once its top-ranked beam
    finishes; whenever any beam COMPLETED (emitted <eos>), the returned
    best hypothesis must be a completed one — truncated live beams frozen
    by the sentence stop are masked from the ranking even though the
    freeze marks their `finished` flags (the flags are NOT trusted;
    completion is derived from the token buffer — regression for a review
    finding where a truncated beam outranked the finished one under
    length normalization). The two-phase compacted search must reproduce
    the single-loop eos_top results exactly."""
    import jax as _jax

    from vag_nmt_tpu.decode.beam import beam_search_two_phase

    params, m, state = setup
    # Bias the output layer toward <eos> so completions actually occur
    # mid-search on the toy fixture (unbiased random params emit zero
    # <eos> within 12 steps, which made the original assertions vacuous).
    params = _jax.tree.map(lambda a: a, params)  # shallow-copy tree
    b_out = params["decoder"]["readout"]["b_out"]
    params["decoder"] = dict(params["decoder"])
    params["decoder"]["readout"] = dict(params["decoder"]["readout"])
    params["decoder"]["readout"]["b_out"] = b_out.at[EOS_ID].add(2.5)

    res = beam_search(params, m, state, beam_size=4, max_len=12,
                      beam_finish="eos_top")
    ref = beam_search(params, m, state, beam_size=4, max_len=12)
    toks = np.asarray(res.best_tokens)
    lens = np.asarray(res.best_lengths)
    all_toks = np.asarray(res.tokens)
    all_lens = np.asarray(res.lengths)
    # the bias must make the scenario real: some sentence completes
    completed = np.zeros(all_lens.shape, bool)
    for r in range(all_lens.shape[0]):
        for k in range(all_lens.shape[1]):
            L = all_lens[r, k]
            completed[r, k] = L > 0 and all_toks[r, k, L - 1] == EOS_ID
    assert completed.any(), "fixture produced no <eos> — test is vacuous"
    # well-formed: tokens after the hypothesis length are PAD
    for r in range(toks.shape[0]):
        assert (toks[r, lens[r]:] == PAD_ID).all()
    # whenever any beam completed, the BEST beam is a completed one
    for r in range(toks.shape[0]):
        if completed[r].any():
            assert toks[r, lens[r] - 1] == EOS_ID
    # eos_top can only SHORTEN the search relative to all_frozen
    assert np.asarray(res.lengths).max() <= np.asarray(ref.lengths).max()

    res2, _, _ = beam_search_two_phase(
        params, m, state, beam_size=4, max_len=12, chunk=2, split_len=3,
        beam_finish="eos_top")
    np.testing.assert_array_equal(np.asarray(res2.tokens),
                                  np.asarray(res.tokens))
    np.testing.assert_array_equal(np.asarray(res2.scores),
                                  np.asarray(res.scores))

    with pytest.raises(ValueError):
        beam_search(params, m, state, beam_size=4, max_len=12,
                    beam_finish="bogus")


def test_finalize_masks_truncated_beams_under_eos_top():
    """Direct regression for the review finding: a live beam truncated by
    the eos_top sentence freeze has a better length-normalized score than
    the completed hypothesis (raw -1.05 over 9 tokens vs -1.0 over 2) —
    the completed one must still win, and a sentence with no completed
    beam falls back to normalized ranking."""
    from vag_nmt_tpu.decode.beam import _finalize

    L = 12
    tokens = np.full((2, 2, L), PAD_ID, np.int32)
    # sentence 0: beam 0 completed (ends with <eos>, len 2), beam 1
    # truncated at len 9 (no <eos>)
    tokens[0, 0, :2] = [7, EOS_ID]
    tokens[0, 1, :9] = [5] * 9
    # sentence 1: nothing completed
    tokens[1, 0, :3] = [5, 6, 7]
    tokens[1, 1, :9] = [8] * 9
    lengths = np.asarray([[2, 9], [3, 9]], np.int32)
    scores = np.asarray([[-1.0, -1.05], [-0.9, -1.8]], np.float32)
    res = _finalize(jnp.asarray(tokens), jnp.asarray(lengths),
                    jnp.asarray(scores), L, 1.0, mask_incomplete=True)
    assert int(res.best_lengths[0]) == 2
    assert np.asarray(res.best_tokens)[0, 1] == EOS_ID
    # no completed beam: fall back to normalized ranking (-0.9/3 = -0.3
    # beats -1.8/9 = -0.2? no: -0.2 > -0.3, the LONG one wins the norm)
    assert int(res.best_lengths[1]) == 9


def test_row_cap_freezes_rows_at_their_cap(setup):
    """max_len_factor semantics: row i freezes at row_cap[i] — lengths and
    token buffers respect the per-row cap, a cap of max_len is a no-op, and
    results are identical under two-phase re-packing."""
    from vag_nmt_tpu.decode.beam import beam_search_two_phase

    params, m, state = setup
    B = state.s0.shape[0]
    caps = jnp.asarray([2, 3, 12, 5, 12, 1], jnp.int32)
    res = beam_search(params, m, state, beam_size=3, max_len=12,
                      row_cap=caps)
    lens = np.asarray(res.lengths)
    for r in range(B):
        assert (lens[r] <= int(caps[r])).all()
        assert (np.asarray(res.tokens)[r, :, int(caps[r]):] == PAD_ID).all()

    full = beam_search(params, m, state, beam_size=3, max_len=12)
    nocap = beam_search(params, m, state, beam_size=3, max_len=12,
                        row_cap=jnp.full((B,), 12, jnp.int32))
    np.testing.assert_array_equal(np.asarray(nocap.tokens),
                                  np.asarray(full.tokens))

    res2, _, _ = beam_search_two_phase(
        params, m, state, beam_size=3, max_len=12, chunk=2, split_len=4,
        row_cap=caps)
    np.testing.assert_array_equal(np.asarray(res2.tokens),
                                  np.asarray(res.tokens))
    np.testing.assert_array_equal(np.asarray(res2.scores),
                                  np.asarray(res.scores))


def test_max_len_factor_fused_corpus():
    """cfg.decode.max_len_factor bounds every hypothesis by its own source
    length through the fused corpus path."""
    from vag_nmt_tpu.core.config import preset
    from vag_nmt_tpu.data.batching import Example
    from vag_nmt_tpu.data.vocab import Vocab
    from vag_nmt_tpu.decode.translate import translate_corpus
    from vag_nmt_tpu.models import init_params

    cfg = preset("toy").replace(decode=dict(max_len_factor=1.0,
                                            max_len_offset=1))
    m = cfg.model
    params = init_params(jax.random.key(0), m)
    rng = np.random.RandomState(5)
    exs = []
    for i in range(9):
        L = int(rng.randint(2, 9))
        exs.append(Example(src=list(rng.randint(4, m.src_vocab_size, L)),
                           img=rng.randn(m.img_feat_dim).astype(np.float32),
                           index=i))
    vocab = Vocab(["<pad>", "<unk>", "<sos>", "<eos>"]
                  + [f"t{i}" for i in range(m.tgt_vocab_size - 4)])
    hyps, stats = translate_corpus(params, cfg, exs, vocab, beam_size=3)
    for ex, h in zip(exs, hyps):
        n_units = len(h.split()) if h else 0
        assert n_units <= len(ex.src) + 1


@pytest.mark.parametrize("slots,thresh", [(2, 1), (3, 2), (6, 1), (4, 0)])
def test_streaming_beam_matches_single_loop(setup, slots, thresh):
    """beam_search_streaming (continuous-batching refill) is EXACT: each
    row's carry evolves identically whatever slot it rides in, so results
    match the plain chunked search bit for bit for any slot count and
    refill threshold."""
    from vag_nmt_tpu.decode.beam import beam_search_streaming

    params, m, state = setup
    ref = beam_search(params, m, state, beam_size=3, max_len=12)
    res, steps, refills = beam_search_streaming(
        params, m, state, beam_size=3, max_len=12, slots=slots,
        refill_threshold=thresh)
    np.testing.assert_array_equal(np.asarray(res.tokens),
                                  np.asarray(ref.tokens))
    np.testing.assert_array_equal(np.asarray(res.lengths),
                                  np.asarray(ref.lengths))
    np.testing.assert_array_equal(np.asarray(res.scores),
                                  np.asarray(ref.scores))
    assert int(steps) >= 12  # at least one slot-generation of work
    assert int(refills) >= 0


def test_streaming_beam_with_caps_tables_eos_top(setup):
    from vag_nmt_tpu.decode.beam import beam_search_streaming
    from vag_nmt_tpu.models.decoder import decode_tables

    params, m, state = setup
    B = state.s0.shape[0]
    caps = jnp.asarray([2, 12, 3, 12, 5, 1], jnp.int32)
    tables = decode_tables(params["decoder"])
    ref = beam_search(params, m, state, beam_size=3, max_len=12,
                      tables=tables, beam_finish="eos_top", row_cap=caps)
    res, _, _ = beam_search_streaming(
        params, m, state, beam_size=3, max_len=12, slots=2,
        refill_threshold=1, tables=tables, beam_finish="eos_top",
        row_cap=caps)
    np.testing.assert_array_equal(np.asarray(res.tokens),
                                  np.asarray(ref.tokens))
    np.testing.assert_array_equal(np.asarray(res.scores),
                                  np.asarray(ref.scores))


# ---- exact admissible beam pruning (VERDICT r3 item 1) --------------------

def _scripted_beam(monkeypatch, max_len, logp_table, B, K, H=4, **kw):
    """Run beam_search against a SCRIPTED posterior: decode_step_topk is
    replaced by a fake that reproduces its candidate contract exactly
    (live beams score `scores + logp`, finished beams ride <pad> at
    log-prob 0) with per-(sentence, step) log-probs from `logp_table`
    ((B, max_len+1, V)); the hidden state is reused as the step counter.
    This pins the prune logic itself under a deterministic wanderer
    posterior — brief real-model training can't reliably produce one (the
    bound only fires when a live beam decays FASTER than the worst frozen
    hypothesis's per-token score, which near-uniform toy posteriors never
    do; see _make_body_1's docstring)."""
    import dataclasses

    from vag_nmt_tpu.core.config import preset
    from vag_nmt_tpu.decode import beam as beam_mod
    from vag_nmt_tpu.models.model import DecodeState

    V = logp_table.shape[-1]
    m = dataclasses.replace(preset("toy").model, tgt_vocab_size=V)
    tab = jnp.asarray(logp_table, jnp.float32)
    pad_ride = jnp.full((V,), beam_mod.NEG_INF, jnp.float32).at[PAD_ID].set(0.0)

    def fake_step(params, cfg, tok, s, state, scores, finished, *,
                  impl="auto", tables=None, defer_exact=False, exact=False,
                  ban=None):
        t = jnp.clip(s[:, 0, 0].astype(jnp.int32), 0, max_len)
        lp = tab[jnp.arange(s.shape[0]), t]                   # (B, V)
        cand = scores[:, :, None] + lp[:, None, :]
        cand = jnp.where(finished[:, :, None],
                         scores[:, :, None] + pad_ride[None, None, :], cand)
        top_scores, idx = jax.lax.top_k(
            cand.reshape(s.shape[0], -1), scores.shape[1])
        out = (s + 1.0, top_scores, idx)
        if defer_exact:
            out = out + (jnp.zeros((), bool),)
        return out

    monkeypatch.setattr(beam_mod, "decode_step_topk", fake_step)
    state = DecodeState(ctx=jnp.zeros((B, 4, 8)), ctx_proj=jnp.zeros((B, 4, 8)),
                        src_mask=jnp.ones((B, 4)), s0=jnp.zeros((B, H)))
    return beam_mod.beam_search(params={}, cfg=m, state=state, beam_size=K,
                                max_len=max_len, **kw)


def _wanderer_script(max_len, V=6):
    """Sentence 0: one hypothesis finishes immediately at -0.5, the rest
    wander on token 4 at -1.2/step (EOS never competitive). Sentence 1:
    everything finishes within two steps (control)."""
    lp = np.full((2, max_len + 1, V), -20.0, np.float32)
    lp[0, 0, [EOS_ID, 4, 5]] = [-0.5, -0.6, -3.0]
    lp[0, 1:, [EOS_ID]] = -9.0
    lp[0, 1:, 4] = -1.2
    lp[0, 1:, 5] = -5.0
    lp[1, 0, [EOS_ID, 4, 5]] = [-0.3, -0.4, -0.55]
    lp[1, 1:, [EOS_ID]] = -0.2
    lp[1, 1:, 4] = -4.0
    lp[1, 1:, 5] = -5.0
    return lp


def test_beam_prune_fires_and_preserves_completed_ranking(monkeypatch):
    """The admissible bound fires on the scripted wanderer (raw/cap**alpha
    drops below the frozen hypothesis's normalized score at step ~14 << 32)
    and the ranked output down to the last frozen slot is bit-identical
    with pruning on/off (the exactness contract)."""
    MAXLEN = 32
    lp = _wanderer_script(MAXLEN)
    on = _scripted_beam(monkeypatch, MAXLEN, lp, B=2, K=3, prune=True)
    off = _scripted_beam(monkeypatch, MAXLEN, lp, B=2, K=3, prune=False)

    t_on, l_on, s_on = map(np.asarray, (on.tokens, on.lengths, on.scores))
    t_off, l_off, s_off = map(np.asarray, (off.tokens, off.lengths,
                                           off.scores))
    last_on = np.take_along_axis(t_on, np.maximum(l_on - 1, 0)[..., None],
                                 2)[..., 0]
    pruned = (last_on != EOS_ID) & (l_on < MAXLEN)

    # It fired: sentence 0's two wanderer beams froze mid-flight...
    assert pruned[0].sum() == 2
    w_lens = l_on[0][pruned[0]]
    assert (w_lens >= 10).all() and (w_lens <= 18).all()
    # ...while without pruning they ride to max_len.
    assert (l_off[0] == MAXLEN).sum() == 2
    # Sentence 1 finished on its own; pruning never fired there.
    assert pruned[1].sum() == 0
    np.testing.assert_array_equal(t_on[1], t_off[1])

    # Exactness: per sentence, everything ranked above the pruned slots
    # (in particular the best hypothesis and every completed one) is
    # bit-identical.
    for b in range(2):
        k = t_on.shape[1] - pruned[b].sum()
        np.testing.assert_array_equal(t_on[b, :k], t_off[b, :k])
        np.testing.assert_array_equal(l_on[b, :k], l_off[b, :k])
        np.testing.assert_allclose(s_on[b, :k], s_off[b, :k])
    # The winner is the immediately-finished hypothesis, found by both.
    assert l_on[0, 0] == 1 and t_on[0, 0, 0] == EOS_ID
    np.testing.assert_array_equal(np.asarray(on.best_tokens),
                                  np.asarray(off.best_tokens))


def test_beam_prune_row_cap_tightens_bound(monkeypatch):
    """row_cap enters the admissible bound (raw/min(cap,max_len)**alpha),
    so a tighter cap fires the prune EARLIER than max_len alone would."""
    MAXLEN = 32
    lp = _wanderer_script(MAXLEN)
    caps = jnp.asarray([16, 16], jnp.int32)
    res = _scripted_beam(monkeypatch, MAXLEN, lp, B=2, K=3, prune=True,
                         row_cap=caps)
    l = np.asarray(res.lengths)
    t = np.asarray(res.tokens)
    last = np.take_along_axis(t, np.maximum(l - 1, 0)[..., None], 2)[..., 0]
    pruned = (last != EOS_ID) & (l < 16)
    # threshold raw < -0.5*16 = -8 -> fires at step ~7-9, vs ~13-15 at cap 32
    assert pruned[0].sum() == 2
    assert (l[0][pruned[0]] <= 10).all()
    # the frozen winner is untouched
    assert l[0, 0] == 1 and t[0, 0, 0] == EOS_ID


# ---- no-repeat n-gram blocking (semantic knob; r4) -------------------------

def _ngram_repeats(toks, length, n):
    """Count repeated n-grams in toks[:length] (fairseq ban semantics: an
    n-gram occurring twice). The final <eos> participates like any token."""
    seen, reps = set(), 0
    for i in range(max(0, int(length) - n + 1)):
        g = tuple(int(x) for x in toks[i:i + n])
        if g in seen:
            reps += 1
        seen.add(g)
    return reps


def test_block_ngram_outputs_have_no_repeats(setup):
    """With block_ngram=n, NO ranked hypothesis may contain a repeated
    n-gram (the ban is applied at candidate scoring, so a repeat can never
    be selected). The unblocked random-init decode must show repeats
    somewhere (or the property test would be vacuous)."""
    params, m, state = setup
    n = 2
    base = beam_search(params, m, state, beam_size=4, max_len=24,
                       block_ngram=0)
    blocked = beam_search(params, m, state, beam_size=4, max_len=24,
                          block_ngram=n)
    t0, l0 = np.asarray(base.tokens), np.asarray(base.lengths)
    t1, l1 = np.asarray(blocked.tokens), np.asarray(blocked.lengths)
    base_reps = sum(_ngram_repeats(t0[b, k], l0[b, k], n)
                    for b in range(t0.shape[0]) for k in range(t0.shape[1]))
    assert base_reps > 0, "vacuous: unblocked decode produced no repeats"
    for b in range(t1.shape[0]):
        for k in range(t1.shape[1]):
            assert _ngram_repeats(t1[b, k], l1[b, k], n) == 0, (b, k)


def test_block_ngram_architecture_parity(setup):
    """Blocking computes its ban list from the token buffer + the step
    counter, both of which differ in REPRESENTATION across the three beam
    architectures (shared scalar t vs per-row t; re-packed chunks) — the
    results must be identical anyway."""
    from vag_nmt_tpu.decode.beam import (
        beam_search_streaming,
        beam_search_two_phase,
    )

    params, m, state = setup
    kw = dict(beam_size=3, max_len=16, block_ngram=2)
    ref = beam_search(params, m, state, **kw)
    two, _, _ = beam_search_two_phase(params, m, state, chunk=3,
                                      split_len=4, **kw)
    stre, _, _ = beam_search_streaming(params, m, state, slots=3,
                                       refill_threshold=1, **kw)
    for got in (two, stre):
        np.testing.assert_array_equal(np.asarray(got.tokens),
                                      np.asarray(ref.tokens))
        np.testing.assert_array_equal(np.asarray(got.lengths),
                                      np.asarray(ref.lengths))
        np.testing.assert_allclose(np.asarray(got.scores),
                                   np.asarray(ref.scores), rtol=1e-6)


def test_block_ngram_env_override(setup, monkeypatch):
    """VAG_BLOCK_NGRAM env wins over the argument (A/B convention)."""
    params, m, state = setup
    ref_on = beam_search(params, m, state, beam_size=3, max_len=16,
                         block_ngram=2)
    monkeypatch.setenv("VAG_BLOCK_NGRAM", "2")
    via_env = beam_search(params, m, state, beam_size=3, max_len=16,
                          block_ngram=0)
    np.testing.assert_array_equal(np.asarray(via_env.tokens),
                                  np.asarray(ref_on.tokens))
    monkeypatch.setenv("VAG_BLOCK_NGRAM", "0")
    via_off = beam_search(params, m, state, beam_size=3, max_len=16,
                          block_ngram=2)
    ref_off = beam_search(params, m, state, beam_size=3, max_len=16,
                          block_ngram=0)
    np.testing.assert_array_equal(np.asarray(via_off.tokens),
                                  np.asarray(ref_off.tokens))


def test_block_ngram_greedy_outputs_have_no_repeats(setup):
    """Greedy (beam_size=1) honors block_ngram (review finding r4: the knob
    was silently ignored on the greedy path — exactly the repetition-prone
    configuration it exists to cure). Same property as the beam test: no
    output may contain a repeated n-gram, and the unblocked decode must
    show repeats somewhere or the property is vacuous."""
    params, m, state = setup
    n = 2
    t0, l0 = greedy_decode(params, m, state, max_len=24, block_ngram=0)
    t1, l1 = greedy_decode(params, m, state, max_len=24, block_ngram=n)
    t0, l0 = np.asarray(t0), np.asarray(l0)
    t1, l1 = np.asarray(t1), np.asarray(l1)
    base_reps = sum(_ngram_repeats(t0[b], l0[b], n)
                    for b in range(t0.shape[0]))
    assert base_reps > 0, "vacuous: unblocked greedy produced no repeats"
    for b in range(t1.shape[0]):
        assert _ngram_repeats(t1[b], l1[b], n) == 0, b


def test_block_ngram_greedy_noop_when_disabled(setup):
    """block_ngram <= 1 must leave greedy outputs bit-identical (the ban
    machinery must not perturb the no-blocking path)."""
    params, m, state = setup
    t0, l0 = greedy_decode(params, m, state, max_len=16)
    t1, l1 = greedy_decode(params, m, state, max_len=16, block_ngram=0)
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))



def test_block_ngram_fused_matches_unfused(setup, monkeypatch):
    """The ban now rides INTO the fused readout->top-k kernel as a dense
    streamed vocab mask (r4 — blocking previously forced the whole unfused
    pipeline): full beam search with blocking through the fused kernel
    (interpret mode off-TPU) must match the unfused logits-scatter path,
    including at slot depth < K (the watermark/deferred-recovery regime)
    and in deferred mode."""
    params, m, state = setup
    monkeypatch.setenv("VAG_READOUT_TOPK", "unfused")
    ref = beam_search(params, m, state, beam_size=3, max_len=16,
                      block_ngram=2)
    monkeypatch.setenv("VAG_READOUT_TOPK", "fused")
    for slots in ("", "1"):
        if slots:
            monkeypatch.setenv("VAG_FRT_SLOTS", slots)
        fused = beam_search(params, m, state, beam_size=3, max_len=16,
                            block_ngram=2)
        np.testing.assert_array_equal(np.asarray(fused.tokens),
                                      np.asarray(ref.tokens))
        np.testing.assert_array_equal(np.asarray(fused.lengths),
                                      np.asarray(ref.lengths))
        np.testing.assert_allclose(np.asarray(fused.scores),
                                   np.asarray(ref.scores),
                                   rtol=1e-5, atol=1e-5)
