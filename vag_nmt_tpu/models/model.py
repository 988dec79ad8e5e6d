"""Model assembly (SURVEY.md C10): the VAG multimodal model and the text-only
NMT baseline in one pure-functional family, switched by ``cfg.multimodal``.

The whole training objective — encoder scans, visual projection, grounding
attention, teacher-forced decoder scan, masked cross-entropy, and the
max-margin VSE loss — traces into ONE jitted XLA graph (the reference runs
these as separate CUDA launches per decoder step, SURVEY.md §3.1).

Image-guided decoder init (SURVEY.md C9, [LOW-CONF exact formula]):
    s0 = tanh(mean_ctx @ w_ctx + t_vec @ w_vis + b)
where `t_vec` is the grounding-attention-weighted encoder summary; the
text-only baseline omits the `w_vis` term.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from vag_nmt_tpu.core.config import ModelConfig
from vag_nmt_tpu.core.rng import key_for
from vag_nmt_tpu.models import decoder as dec
from vag_nmt_tpu.models import encoder as enc
from vag_nmt_tpu.models import vse
from vag_nmt_tpu.models.layers import init_dense
from vag_nmt_tpu.ops.attention import precompute_ctx_proj
from vag_nmt_tpu.models.layers import masked_mean

Params = Dict[str, Any]


class DecodeState(NamedTuple):
    """Everything the per-step decoder needs, computed once per batch."""
    ctx: jnp.ndarray        # (B, T, C)
    ctx_proj: jnp.ndarray   # (B, T, A)
    src_mask: jnp.ndarray   # (B, T)
    s0: jnp.ndarray         # (B, H)


def init_params(key: jax.Array, cfg: ModelConfig) -> Params:
    p: Params = {
        "encoder": enc.init_encoder(key, cfg),
        "decoder": dec.init_decoder(key, cfg),
        "init": {
            "w_ctx": init_dense(key, cfg.ctx_dim, cfg.dec_hidden_dim,
                                "init/w_ctx")["w"],
            "b": jnp.zeros((cfg.dec_hidden_dim,), jnp.float32),
        },
    }
    if cfg.multimodal:
        p["vse"] = vse.init_vse(key, cfg)
        p["init"]["w_vis"] = init_dense(key, cfg.ctx_dim, cfg.dec_hidden_dim,
                                        "init/w_vis")["w"]
    return p


def _init_decoder_state(params: Params, cfg: ModelConfig, ctx: jnp.ndarray,
                        src_mask: jnp.ndarray,
                        t_vec: Optional[jnp.ndarray]) -> jnp.ndarray:
    pre = jnp.dot(masked_mean(ctx, src_mask), params["init"]["w_ctx"],
                  preferred_element_type=jnp.float32)
    if cfg.multimodal and t_vec is not None:
        pre = pre + jnp.dot(t_vec, params["init"]["w_vis"],
                            preferred_element_type=jnp.float32)
    return jnp.tanh(pre + params["init"]["b"]).astype(ctx.dtype)


def _encode_and_ground(
    params: Params, cfg: ModelConfig, batch: Dict[str, jnp.ndarray],
    *, train: bool, rng: Optional[jax.Array],
):
    ctx = enc.encode(params["encoder"], cfg, batch["src"], batch["src_mask"],
                     train=train, rng=rng)
    img_emb = txt_emb = t_vec = None
    if cfg.multimodal:
        img_emb = vse.image_embedding(params["vse"],
                                      batch["img"].astype(ctx.dtype))
        txt_emb, t_vec, _ = vse.ground(params["vse"], img_emb, ctx,
                                       batch["src_mask"])
    s0 = _init_decoder_state(params, cfg, ctx, batch["src_mask"], t_vec)
    return ctx, s0, img_emb, txt_emb


def loss_fn(
    params: Params,
    cfg: ModelConfig,
    batch: Dict[str, jnp.ndarray],
    rng: Optional[jax.Array] = None,
    *,
    train: bool = True,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Joint loss L = CE + lambda * VSE (SURVEY.md C7/C11). Returns (loss, aux).

    batch keys: src (B,T) int32, src_mask (B,T), tgt_in (B,Tt) int32 starting
    with <sos>, tgt_out (B,Tt) ending with <eos>, tgt_mask (B,Tt); plus
    img (B,F) when cfg.multimodal.
    """
    ctx, s0, img_emb, txt_emb = _encode_and_ground(
        params, cfg, batch, train=train, rng=rng)
    logits = dec.teacher_forced_logits(
        params["decoder"], cfg, batch["tgt_in"], s0, ctx, batch["src_mask"],
        train=train, rng=key_for(rng, "dec") if rng is not None else None)

    logp = jax.nn.log_softmax(logits, axis=-1)
    tgt_logp = jnp.take_along_axis(
        logp, batch["tgt_out"][..., None], axis=-1)[..., 0]
    tmask = batch["tgt_mask"].astype(jnp.float32)
    ntok = jnp.maximum(tmask.sum(), 1.0)
    ce = -(tgt_logp * tmask).sum() / ntok
    acc = ((logits.argmax(-1) == batch["tgt_out"]) * tmask).sum() / ntok

    aux = {"ce": ce, "acc": acc, "ntokens": tmask.sum()}
    total = ce
    if cfg.multimodal:
        vse_l = vse.max_margin_loss(img_emb, txt_emb, cfg.vse_margin,
                                    cfg.vse_hard_negatives,
                                    sample_mask=batch.get("sample_mask"))
        total = ce + cfg.vse_weight * vse_l
        aux["vse"] = vse_l
    aux["loss"] = total
    return total, aux


def embeddings_for_retrieval(
    params: Params, cfg: ModelConfig, batch: Dict[str, jnp.ndarray]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(img_emb, txt_emb) in the shared space, for R@K eval (SURVEY.md C18)."""
    if not cfg.multimodal:
        raise ValueError("retrieval requires a multimodal config")
    _, _, img_emb, txt_emb = _encode_and_ground(
        params, cfg, batch, train=False, rng=None)
    return img_emb, txt_emb


def prepare_decode(
    params: Params, cfg: ModelConfig, batch: Dict[str, jnp.ndarray]
) -> DecodeState:
    """Encode once per batch; all per-step work is in `decode_step`."""
    ctx, s0, _, _ = _encode_and_ground(params, cfg, batch, train=False, rng=None)
    return DecodeState(
        ctx=ctx,
        ctx_proj=precompute_ctx_proj(params["decoder"]["attn"], ctx),
        src_mask=batch["src_mask"],
        s0=s0,
    )


def decode_step(
    params: Params,
    cfg: ModelConfig,
    tok: jnp.ndarray,       # (B, K) previous tokens, K beams per sentence
    s: jnp.ndarray,         # (B, K, H)
    state: DecodeState,     # per-sentence fields, shared across beams
    tables: Optional[Dict[str, jnp.ndarray]] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (s_new (B,K,H), fp32 logits (B,K,V)). Encoder state is NOT
    tiled across beams — attention broadcasts over the beam axis (greedy is
    the K=1 case). tables: optional per-vocab gate/readout tables
    (dec.decode_tables), computed once per decode dispatch."""
    s_new, logits, _ = dec.decode_step_beams(
        params["decoder"], cfg, tok, s, state.ctx, state.ctx_proj,
        state.src_mask, tables)
    return s_new, logits


def decode_step_topk(
    params: Params,
    cfg: ModelConfig,
    tok: jnp.ndarray,       # (B, K) previous tokens
    s: jnp.ndarray,         # (B, K, H)
    state: DecodeState,
    scores: jnp.ndarray,    # (B, K) fp32 running beam scores
    finished: jnp.ndarray,  # (B, K) bool
    *,
    impl: str = "auto",
    tables: Optional[Dict[str, jnp.ndarray]] = None,
    defer_exact: bool = False,
    exact: bool = False,
    ban: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, ...]:
    """One beam step fused with candidate scoring + top-K: returns
    (s_new (B,K,H), top_scores (B,K), flat_idx (B,K), flat = beam*V + token)
    with ops/pallas_topk.beam_topk's candidate semantics.

    impl: "fused" runs the vocab projection inside the streaming
    readout+top-k kernel — the (B*K, V) logits never touch HBM
    (ops/pallas_readout_topk); "unfused" materializes logits and calls
    beam_topk; "auto" picks fused on TPU (env VAG_READOUT_TOPK overrides).

    defer_exact: appends a scalar bool "may be inexact" flag to the return
    instead of the kernel's per-step exactness cond — the beam loop ORs it
    across steps and reruns the chunk exactly if it ever fired (see
    ops/pallas_readout_topk.fused_readout_topk). Constant False on the
    unfused path, which is unconditionally exact.
    exact: force the slot depth to K (the unconditionally exact kernel) —
    the chunk-rerun branch of the deferred recovery.
    ban: optional (B, K, M) int32 banned-token ids for no-repeat n-gram
    blocking (decode/beam.py; id == V is a no-op sentinel, dropped by the
    scatter). On the fused path the ban rides INTO the streaming kernel
    as a dense uint8 vocab mask (r4 — blocking previously forced the
    whole unfused pipeline, measured ~1.6-1.9x slower per step at IKEA
    shapes); on the unfused path it scatters -inf into the materialized
    logits before candidate scoring. Both exclude the banned mass from
    the softmax normalization."""
    if impl == "auto":
        import os

        impl = os.environ.get("VAG_READOUT_TOPK", "")
        if impl not in ("fused", "unfused"):
            impl = "fused" if jax.default_backend() == "tpu" else "unfused"

    if impl == "fused":
        from vag_nmt_tpu.ops.pallas_readout_topk import fused_readout_topk

        s_new, t, w_out, b_out = dec.decode_step_beams_readout(
            params["decoder"], cfg, tok, s, state.ctx, state.ctx_proj,
            state.src_mask, tables)
        # impl="pallas" (not auto): choosing the fused STRUCTURE means the
        # streaming kernel — off-TPU it runs in interpret mode, which is
        # what the cross-impl beam parity tests exercise.
        K = scores.shape[1]
        out = fused_readout_topk(
            t, w_out, b_out, scores, finished,
            None if ban is None else ban.reshape(t.shape[0], -1),
            impl="pallas", slots=K if exact else 0,
            defer_exact=defer_exact)
        return (s_new,) + out

    from vag_nmt_tpu.ops.pallas_topk import beam_topk

    s_new, logits = decode_step(params, cfg, tok, s, state, tables)
    if ban is not None:
        Bk, Kk, Vk = logits.shape
        flat = logits.reshape(Bk * Kk, Vk)
        rows = jnp.arange(Bk * Kk, dtype=jnp.int32)[:, None]
        # scatter-min; out-of-range sentinel ids (== V) are dropped
        flat = flat.at[rows, ban.reshape(Bk * Kk, -1)].min(
            jnp.float32(-1e9))
        logits = flat.reshape(Bk, Kk, Vk)
    top_scores, idx = beam_topk(logits, scores, finished)
    if defer_exact:
        return s_new, top_scores, idx, jnp.zeros((), bool)
    return s_new, top_scores, idx
