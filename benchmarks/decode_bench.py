"""Beam-decode per-step cost decomposition on the REAL chip.

BENCH_r02 measured ~518 us per beam while_loop step (total loop steps vs
elapsed) against ~40 us of pure MXU time — 'latency'-bound per the roofline.
This bench decomposes ONE beam step into its parts to find where the time
actually goes, using the fetch-delta method (block_until_ready does not
block on the tunneled axon platform; see benchmarks/topk_bench.py):

  A  full beam body       decode_step + beam_topk + beam gathers + writes
  B  decode_step+logits   GRU1/attn/GRU2/readout incl. the (R,V) output GEMM,
                          logits materialized (barrier), no topk
  C  decode_step-no-V     same minus the output GEMM + logits materialization
  D  beam_topk alone      production impl on fixed pre-computed logits
  E  fused rd+topk        ops/pallas_readout_topk fused kernel (t -> topk)
  F  gathers alone        the beam-reorder take_along_axis set

B - C  = cost of producing+materializing the (B*K, V) fp32 logits
A - (C + D + F) = glue the decomposition does not explain
C + D vs C + E = what the fused readout->topk kernel saves per step

Run ON TPU:  python benchmarks/decode_bench.py
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

REPS = 100


from benchmarks._timing import bench_delta as _bench_delta


def bench_delta(make_run, *args, warmup=1, iters=7):
    """See benchmarks/_timing.py (shared fetch-delta methodology)."""
    return _bench_delta(make_run, *args, reps=REPS, warmup=warmup,
                        iters=iters)


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/vag_nmt_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    from vag_nmt_tpu.core.config import preset
    from vag_nmt_tpu.models.model import DecodeState, decode_step, init_params
    from vag_nmt_tpu.models import decoder as dec
    from vag_nmt_tpu.models.layers import embed
    from vag_nmt_tpu.ops.gru import gru_cell_from_xgates, gru_gates_from_x
    from vag_nmt_tpu.ops.attention import bahdanau_attend_beams
    from vag_nmt_tpu.ops.pallas_topk import beam_topk
    from vag_nmt_tpu.utils.pytree import cast_floats

    cfg = preset("m30k_ende_vag").replace(model=dict(compute_dtype="bfloat16"))
    m = cfg.model
    B, K, V, T = 128, 5, m.tgt_vocab_size, 32
    H = m.dec_hidden_dim

    params = init_params(jax.random.key(0), m)
    params = cast_floats(params, jnp.bfloat16)
    rng = np.random.RandomState(0)
    ctx = jnp.asarray(rng.randn(B, T, m.ctx_dim), jnp.bfloat16)
    ctx_proj = jnp.asarray(rng.randn(B, T, m.attn_dim), jnp.bfloat16)
    src_mask = jnp.asarray(rng.rand(B, T) < 0.8, jnp.float32)
    s0 = jnp.asarray(rng.randn(B, K, H), jnp.bfloat16)
    state = DecodeState(ctx=ctx, ctx_proj=ctx_proj, src_mask=src_mask,
                        s0=jnp.zeros((B, H), jnp.bfloat16))
    logits0 = jnp.asarray(rng.randn(B, K, V), jnp.float32)
    scores0 = jnp.asarray(rng.randn(B, K), jnp.float32)
    finished0 = jnp.asarray(rng.rand(B, K) < 0.2)
    tok0 = jnp.asarray(rng.randint(4, V, (B, K)), jnp.int32)
    tokens0 = jnp.zeros((B, K, 64), jnp.int32)

    dp = params["decoder"]

    def case_full(n):
        @jax.jit
        def run(s, scores, tokens):
            def body(t, carry):
                tok, s, scores, tokens = carry
                s_new, logits = decode_step(params, m, tok, s, state)
                top_scores, idx = beam_topk(logits, scores,
                                            finished0)
                beam_idx = idx // V
                tokn = (idx % V).astype(jnp.int32)

                def sel(x):
                    return jnp.take_along_axis(
                        x, beam_idx.reshape(
                            beam_idx.shape + (1,) * (x.ndim - 2)), axis=1)

                s_sel = sel(s_new)
                tokens = sel(tokens)
                tokens = tokens.at[:, :, t % 64].set(tokn)
                return tokn, s_sel, top_scores, tokens
            tok, s, scores, tokens = jax.lax.fori_loop(
                0, n, body, (tok0, s, scores, tokens))
            return s, scores, tokens
        return run

    def case_step_logits(n):
        @jax.jit
        def run(s, scores, tokens):
            def body(t, carry):
                s, acc = carry
                tok = tok0 + (t % 2)
                s_new, logits = decode_step(params, m, tok, s, state)
                logits = jax.lax.optimization_barrier(logits)
                return s_new, acc + logits[:, :, 0] * 1e-9
            s, acc = jax.lax.fori_loop(0, n, body, (s, scores))
            return s, acc
        return run

    def case_step_nov(n):
        # decode_step minus the output GEMM: GRU1 + attention + GRU2 + the
        # (E/H/C -> R) readout tanh, consuming t via a slice.
        @jax.jit
        def run(s, scores, tokens):
            def body(t, carry):
                s, acc = carry
                tok = tok0 + (t % 2)
                y = embed(dp["embed"], tok.reshape(-1)).astype(ctx.dtype)
                xg1 = gru_gates_from_x(dp["gru1"], y)
                s_tilde = gru_cell_from_xgates(dp["gru1"], xg1,
                                               s.reshape(B * K, H))
                c, _ = bahdanau_attend_beams(
                    dp["attn"], s_tilde.reshape(B, K, H), ctx, ctx_proj,
                    src_mask)
                c_flat = c.reshape(B * K, -1)
                s_new = gru_cell_from_xgates(
                    dp["gru2"], gru_gates_from_x(dp["gru2"], c_flat), s_tilde)
                r = dp["readout"]
                tt = jnp.tanh(
                    jnp.dot(y, r["wy"], preferred_element_type=jnp.float32)
                    + jnp.dot(s_new, r["ws"],
                              preferred_element_type=jnp.float32)
                    + jnp.dot(c_flat, r["wc"],
                              preferred_element_type=jnp.float32)
                    + r["b"])
                return (s_new.reshape(B, K, H),
                        acc + tt.reshape(B, K, -1)[:, :, 0] * 1e-9)
            s, acc = jax.lax.fori_loop(0, n, body, (s, scores))
            return s, acc
        return run

    def case_topk(n):
        @jax.jit
        def run(s, scores, tokens):
            def body(t, sc):
                v, idx = beam_topk(logits0, sc, finished0)
                return sc * 0.9 + v * 0.1 + idx.astype(jnp.float32) * 1e-9
            return jax.lax.fori_loop(0, n, body, scores)
        return run

    def case_gathers(n):
        @jax.jit
        def run(s, scores, tokens):
            def body(t, carry):
                s, tokens, scores = carry
                beam_idx = (scores.astype(jnp.int32) + t) % K

                def sel(x):
                    return jnp.take_along_axis(
                        x, beam_idx.reshape(
                            beam_idx.shape + (1,) * (x.ndim - 2)), axis=1)

                s = sel(s)
                tokens = sel(tokens)
                tokens = tokens.at[:, :, t % 64].set(beam_idx)
                return s, tokens, scores + 1.0
            s, tokens, scores = jax.lax.fori_loop(
                0, n, body, (s, tokens, scores))
            return s, tokens, scores
        return run

    def case_gru1(n):
        # embed + GRU1 x-gates + cell only
        @jax.jit
        def run(s, scores, tokens):
            def body(t, carry):
                s, acc = carry
                tok = tok0 + (t % 2)
                y = embed(dp["embed"], tok.reshape(-1)).astype(ctx.dtype)
                xg1 = gru_gates_from_x(dp["gru1"], y)
                s_tilde = gru_cell_from_xgates(dp["gru1"], xg1,
                                               s.reshape(B * K, H))
                return (s_tilde.reshape(B, K, H),
                        acc + s_tilde.reshape(B, K, -1)[:, :, 0] * 1e-9)
            s, acc = jax.lax.fori_loop(0, n, body, (s, scores))
            return s, acc
        return run

    def case_attn(n):
        # Bahdanau attention over the beam axis only (fixed query carry)
        @jax.jit
        def run(s, scores, tokens):
            def body(t, carry):
                s, acc = carry
                c, _ = bahdanau_attend_beams(
                    dp["attn"], s.astype(ctx.dtype), ctx, ctx_proj, src_mask)
                return (s * 0.99 + c[..., :H].astype(s.dtype) * 0.01,
                        acc + c[:, :, 0] * 1e-9)
            s, acc = jax.lax.fori_loop(0, n, body, (s, scores))
            return s, acc
        return run

    def case_gru2(n):
        # GRU2 x-gates from a (B*K, C) context + cell
        c0 = jnp.asarray(rng.randn(B * K, m.ctx_dim), jnp.bfloat16)

        @jax.jit
        def run(s, scores, tokens):
            def body(t, carry):
                s, acc = carry
                cc = c0 + s.reshape(B * K, H)[:, :1].astype(c0.dtype) * 1e-9
                s_new = gru_cell_from_xgates(
                    dp["gru2"], gru_gates_from_x(dp["gru2"], cc),
                    s.reshape(B * K, H))
                return (s_new.reshape(B, K, H),
                        acc + s_new.reshape(B, K, -1)[:, :, 0] * 1e-9)
            s, acc = jax.lax.fori_loop(0, n, body, (s, scores))
            return s, acc
        return run

    def make_case_prod(tables):
        # PRODUCTION beam-loop body: decode_step_topk(impl="fused") + the
        # beam gathers + token write — everything the while_loop body does
        # except the cond. `tables` None/dict A/Bs the per-vocab
        # gate/readout tables (decoder.decode_tables).
        from vag_nmt_tpu.models.model import decode_step_topk

        def case_prod(n):
            @jax.jit
            def run(s, scores, tokens):
                def body(t, carry):
                    tok, s, scores, tokens = carry
                    s_new, top_scores, idx = decode_step_topk(
                        params, m, tok, s, state, scores, finished0,
                        impl="fused", tables=tables)
                    beam_idx = idx // V
                    tokn = (idx % V).astype(jnp.int32)

                    def sel(x):
                        return jnp.take_along_axis(
                            x, beam_idx.reshape(
                                beam_idx.shape + (1,) * (x.ndim - 2)),
                            axis=1)

                    s_sel = sel(s_new)
                    tokens = sel(tokens)
                    tokens = tokens.at[:, :, t % 64].set(tokn)
                    return tokn, s_sel, top_scores, tokens
                tok, s, scores, tokens = jax.lax.fori_loop(
                    0, n, body, (tok0, s, scores, tokens))
                return s, scores, tokens
            return run
        return case_prod

    from vag_nmt_tpu.models.decoder import decode_tables

    tables0 = decode_tables(params["decoder"])

    # ---- post-round-3 decomposition of the PRODUCTION (tabled) step ------
    # (VERDICT r3 weak #1 / next #2). The tabled body is:
    #   T1 table gathers        xg1[tok], ty[tok] row gathers
    #   T2 GRU1 cell            gru_cell_from_xgates off the gathered gates
    #   T3 w_s GEMM + attention qh = s_tilde @ [ua|uh2]; Bahdanau over beams
    #   T4 w_c GEMM + GRU2+read xc = c @ [wx2|wc]; cell-from-gates; tanh
    #   E  fused readout->topk  (measured above)
    #   F  beam gathers + write (measured above)
    #   W  while_loop overhead  production body under while_loop(cond) vs
    #                           the same body under fori_loop
    #   PR prune arithmetic     the admissible-bound freeze (r4)
    from vag_nmt_tpu.ops.attention import bahdanau_attend_beams_q
    from vag_nmt_tpu.ops.gru import gru_cell_from_gates

    g2 = dp["gru2"]
    A = dp["attn"]["ua"].shape[1]
    Cdim = m.ctx_dim

    def case_tab_gathers(n):
        @jax.jit
        def run(s, scores, tokens):
            def body(t, carry):
                acc1, acc2 = carry
                tok = (tok0 + t) % V
                gy = jnp.take(tables0["gy"], tok.reshape(-1), axis=0)
                return (acc1 + gy[:, 0] * 1e-9,
                        acc2 + gy[:, 3 * H] * 1e-9)
            return jax.lax.fori_loop(
                0, n, body,
                (jnp.zeros((B * K,), jnp.float32),
                 jnp.zeros((B * K,), jnp.float32)))
        return run

    def case_tab_gru1(n):
        xg1_0 = jnp.asarray(rng.randn(B * K, 3 * H), jnp.float32)

        @jax.jit
        def run(s, scores, tokens):
            def body(t, s):
                s_tilde = gru_cell_from_xgates(
                    dp["gru1"], xg1_0 + s[:, :1] * 1e-9, s)
                return s_tilde
            return jax.lax.fori_loop(0, n, body, s.reshape(B * K, H)
                                     .astype(jnp.float32))
        return run

    def case_tab_ws_attn(n):
        @jax.jit
        def run(s, scores, tokens):
            def body(t, carry):
                st, acc = carry
                qh = jnp.dot(st, tables0["w_s"],
                             preferred_element_type=jnp.float32)
                c, _ = bahdanau_attend_beams_q(
                    dp["attn"], qh[:, :A].reshape(B, K, A), ctx, ctx_proj,
                    src_mask)
                return (st * 0.99
                        + qh[:, A:A + H].astype(st.dtype) * 0.01,
                        acc + c.reshape(B * K, -1)[:, 0] * 1e-9)
            return jax.lax.fori_loop(
                0, n, body, (s.reshape(B * K, H),
                             jnp.zeros((B * K,), jnp.float32)))
        return run

    def case_tab_wc_gru2_readout(n):
        c0f = jnp.asarray(rng.randn(B * K, Cdim), jnp.bfloat16)
        qh0 = jnp.asarray(rng.randn(B * K, 3 * H), jnp.float32)
        ty0 = jnp.asarray(rng.randn(B * K, m.emb_dim),
                          jnp.float32)

        @jax.jit
        def run(s, scores, tokens):
            def body(t, carry):
                st, acc = carry
                cc = c0f + st[:, :1].astype(c0f.dtype) * 1e-9
                xc = jnp.dot(cc, tables0["w_c"],
                             preferred_element_type=jnp.float32)
                s_new = gru_cell_from_gates(
                    xc[:, :3 * H] + g2["bi"], qh0 + g2["bh"], st)
                tt = jnp.tanh(ty0 + jnp.dot(
                    s_new, dp["readout"]["ws"],
                    preferred_element_type=jnp.float32)
                    + xc[:, 3 * H:] + dp["readout"]["b"])
                return s_new, acc + tt[:, 0] * 1e-9
            return jax.lax.fori_loop(
                0, n, body, (s.reshape(B * K, H).astype(jnp.float32),
                             jnp.zeros((B * K,), jnp.float32)))
        return run

    def case_prune_arith(n):
        lengths0 = jnp.asarray(rng.randint(1, 30, (B, K)), jnp.int32)

        @jax.jit
        def run(s, scores, tokens):
            def body(t, carry):
                sc, fin = carry
                fnorm = sc / jnp.maximum(lengths0, 1).astype(jnp.float32)
                inf = jnp.asarray(jnp.inf, jnp.float32)
                fmin = jnp.min(jnp.where(fin, fnorm, inf), axis=1,
                               keepdims=True)
                anyf = jnp.any(fin, axis=1, keepdims=True)
                bound = sc / 64.0
                ok = fin | (bound < fmin)
                fin = fin | (anyf & jnp.all(ok, axis=1, keepdims=True))
                return sc - 0.01, fin
            sc, fin = jax.lax.fori_loop(0, n, body, (scores, finished0))
            return sc, fin
        return run

    def make_case_prod_while(tables):
        # The PRODUCTION body under a counting while_loop: the per-step
        # all-finished cond + loop machinery on top of the fori body —
        # (this minus Pt) = while_loop overhead per step.
        from vag_nmt_tpu.models.model import decode_step_topk

        def case(n):
            @jax.jit
            def run(s, scores, tokens):
                def cond(carry):
                    t, _, _, scores, _ = carry
                    return (t < n) & ~jnp.all(scores < -1e8)

                def body(carry):
                    t, tok, s, scores, tokens = carry
                    s_new, top_scores, idx = decode_step_topk(
                        params, m, tok, s, state, scores, finished0,
                        impl="fused", tables=tables)
                    beam_idx = idx // V
                    tokn = (idx % V).astype(jnp.int32)

                    def sel(x):
                        return jnp.take_along_axis(
                            x, beam_idx.reshape(
                                beam_idx.shape + (1,) * (x.ndim - 2)),
                            axis=1)

                    s_sel = sel(s_new)
                    tokens = sel(tokens)
                    tokens = tokens.at[:, :, t % 64].set(tokn)
                    return t + 1, tokn, s_sel, top_scores, tokens
                _, tok, s, scores, tokens = jax.lax.while_loop(
                    cond, body, (0, tok0, s, scores, tokens))
                return s, scores, tokens
            return run
        return case

    cases = [
        ("A_full_body", case_full),
        ("B_step_with_logits", case_step_logits),
        ("C_step_no_vocab_gemm", case_step_nov),
        ("C1_embed_gru1", case_gru1),
        ("C2_attention", case_attn),
        ("C3_gru2", case_gru2),
        ("D_beam_topk", case_topk),
        ("F_gathers", case_gathers),
        ("P_prod_body", make_case_prod(None)),
        ("Pt_prod_body_tabled", make_case_prod(tables0)),
        ("T1_table_gathers", case_tab_gathers),
        ("T2_gru1_cell", case_tab_gru1),
        ("T3_ws_gemm_attn", case_tab_ws_attn),
        ("T4_wc_gru2_readout", case_tab_wc_gru2_readout),
        ("PR_prune_arith", case_prune_arith),
        ("Wt_prod_while_tabled", make_case_prod_while(tables0)),
    ]
    try:
        from vag_nmt_tpu.ops.pallas_readout_topk import fused_readout_topk

        t_in0 = jnp.asarray(rng.randn(B * K, m.emb_dim), jnp.bfloat16)
        w_out = dp["readout"].get("w_out")
        if w_out is None:
            w_out = dp["embed"]["table"].T
        b_out = dp["readout"]["b_out"].astype(jnp.float32)

        def case_fused(n):
            @jax.jit
            def run(s, scores, tokens):
                def body(t, sc):
                    v, idx = fused_readout_topk(
                        t_in0 + sc.reshape(B * K)[:, None].astype(t_in0.dtype)
                        * 1e-9, w_out, b_out, sc, finished0)
                    return sc * 0.9 + v * 0.1 + idx.astype(jnp.float32) * 1e-9
                return jax.lax.fori_loop(0, n, body, scores)
            return run

        cases.append(("E_fused_readout_topk", case_fused))
    except ImportError:
        pass

    out = {}
    for name, make in cases:
        t = bench_delta(make, s0, scores0, tokens0)
        out[name] = round(t * 1e6, 1)
        print(f"{name:24s} {t * 1e6:9.1f} us/step", flush=True)

    a = out.get("A_full_body")
    b = out.get("B_step_with_logits")
    c = out.get("C_step_no_vocab_gemm")
    d = out.get("D_beam_topk")
    f = out.get("F_gathers")
    if all(x is not None for x in (a, b, c, d, f)):
        print(f"\noutput GEMM + logits materialization (B-C): {b - c:.1f} us")
        print(f"decomposed C+D+F: {c + d + f:.1f} us vs full {a:.1f} us "
              f"(glue/unexplained: {a - c - d - f:.1f} us)")
    pt = out.get("Pt_prod_body_tabled")
    wt = out.get("Wt_prod_while_tabled")
    parts = [out.get(k) for k in ("T1_table_gathers", "T2_gru1_cell",
                                  "T3_ws_gemm_attn", "T4_wc_gru2_readout",
                                  "E_fused_readout_topk", "F_gathers")]
    if pt is not None and all(x is not None for x in parts):
        tot = sum(parts)
        print(f"\nPRODUCTION (tabled) decomposition: "
              f"T1+T2+T3+T4+E+F = {tot:.1f} us vs Pt {pt:.1f} us "
              f"(glue/unexplained: {pt - tot:.1f} us)")
        if wt is not None:
            print(f"while_loop overhead (Wt - Pt): {wt - pt:.1f} us/step")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
