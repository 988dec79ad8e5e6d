"""Typed configuration tree + named presets.

The reference drives each language pair with a separate argparse train script
(SURVEY.md §2 C16, e.g. ``nmt_multimodal_beam_DE.py`` — names unverified, the
reference mount was empty this session). Here one frozen dataclass tree covers
model/data/train/decode settings, with presets for the five BASELINE.json
configs.

LOW-CONF defaults (re-verify against the reference when the mount is populated,
SURVEY.md Verification Checklist items 2-3, 5, 7): ``vse_margin``,
``vse_weight``, ``vse_hard_negatives``, ``length_norm_alpha``, dropout sites,
and the per-preset dims.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Dict, Tuple

# Special token ids — fixed across the framework (SURVEY.md C1).
PAD_ID = 0
UNK_ID = 1
SOS_ID = 2
EOS_ID = 3
SPECIALS = ("<pad>", "<unk>", "<sos>", "<eos>")


@dataclass(frozen=True)
class ModelConfig:
    """Architecture of the (VAG-)NMT model (SURVEY.md C4-C10)."""

    src_vocab_size: int = 8000
    tgt_vocab_size: int = 8000
    emb_dim: int = 256
    hidden_dim: int = 256           # encoder hidden per direction; ctx dim = 2*hidden
    dec_hidden_dim: int = 256       # decoder GRU state size
    attn_dim: int = 256             # Bahdanau MLP attention inner dim
    enc_layers: int = 1
    dropout: float = 0.3
    tied_readout_embedding: bool = False

    # Visual branch (absent in the text-only NMT baseline, SURVEY.md C5-C7, C9).
    multimodal: bool = False
    img_feat_dim: int = 2048        # ResNet-50 pool5 (SURVEY.md C2)
    shared_dim: int = 512           # shared visual-text embedding space
    vse_margin: float = 0.1         # max-margin ranking loss margin  [LOW-CONF]
    vse_weight: float = 0.25        # lambda in L = L_MT + lambda*L_VSE  [LOW-CONF]
    vse_hard_negatives: bool = False  # VSE++ max-violation vs sum  [LOW-CONF]

    # Numerics. Params stay fp32; activations/matmuls may run bf16 with fp32
    # accumulation (MXU-native) when compute_dtype == "bfloat16".
    compute_dtype: str = "float32"

    # Kernel implementation for the GRU scans: "auto" (fused Pallas TPU
    # kernel on TPU — measured >= XLA fwd and 8-27% faster fwd+bwd on v5e,
    # see ops/gru.py — lax.scan elsewhere), "xla" (lax.scan everywhere;
    # the numerics oracle), or "pallas" (force the kernel).
    gru_impl: str = "auto"

    # Kernel implementation for the teacher-forced decoder scan (the train
    # path's GRU1 -> attention -> GRU2 -> readout recurrence): "xla"
    # (lax.scan; the numerics oracle and CPU path), "pallas" (fused
    # time-blocked kernel, ops/pallas_dec_scan.py), or "auto" (on TPU,
    # pallas whenever gradients flow (train=True) or streams are bf16 —
    # the chip-measured win regions from benchmarks/dec_scan_bench.py; xla
    # elsewhere; see docs/architecture.md "Fused decoder-scan kernel").
    dec_scan_impl: str = "auto"

    @property
    def ctx_dim(self) -> int:
        return 2 * self.hidden_dim


@dataclass(frozen=True)
class DataConfig:
    """Corpus + batching settings (SURVEY.md C1-C3)."""

    data_dir: str = ""
    dataset: str = "multi30k"       # "multi30k" | "ikea" | "toy"
    src_lang: str = "en"
    tgt_lang: str = "de"
    bpe_merges: int = 10000
    vocab_min_freq: int = 1
    max_src_len: int = 64
    max_tgt_len: int = 64
    batch_size: int = 64            # global batch (split over the data mesh axis)
    length_buckets: Tuple[int, ...] = (8, 12, 16, 24, 32, 48, 64)
    shuffle_seed: int = 0
    feature_file: str = ""          # aligned .npy pool5 matrix (SURVEY.md C2)


@dataclass(frozen=True)
class TrainConfig:
    """Optimization loop (SURVEY.md C11)."""

    learning_rate: float = 1e-3
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_eps: float = 1e-8
    grad_clip_norm: float = 1.0
    lr_decay_factor: float = 0.5    # multiply lr on dev-BLEU plateau
    lr_decay_patience: int = 3      # evals without improvement before decay
    early_stop_patience: int = 10   # evals without improvement before stop
    max_epochs: int = 100
    eval_every_steps: int = 1000
    log_every_steps: int = 100      # train-metric cadence (each log costs one
                                    # device round trip)
    steps_per_dispatch: int = 8     # K train steps lax.scan'ed per jitted
                                    # dispatch (amortizes per-execution
                                    # overhead; 1 = classic one-step calls).
                                    # Same-shape batches are grouped into
                                    # stacks of K, so the within-epoch batch
                                    # visit order changes with K; numerics of
                                    # any given sequence are exactly the
                                    # sequential single steps (tested). On
                                    # TINY corpora the same-bucket runs
                                    # inside stacks slow early convergence —
                                    # set 1 there (the toy preset does).
    seed: int = 1234
    checkpoint_dir: str = "checkpoints"
    # Checkpoint retention is fixed: a "best" (by dev BLEU, mirroring the
    # reference's best-model save) and a "last" (for resume) tag, each
    # overwritten atomically. No rotating history — deliberate, not a knob.
    resume: bool = False


@dataclass(frozen=True)
class DecodeConfig:
    """Greedy/beam decoding (SURVEY.md C12)."""

    beam_size: int = 5
    max_len: int = 64
    length_norm_alpha: float = 1.0  # score / len**alpha at final ranking [LOW-CONF]
    # 128 measured best on v5e for fused corpus decode (length-sorted chunks
    # early-exit at their own max hypothesis length; see bench.py)
    decode_batch_size: int = 128
    # Beam while_loop steps per iteration: U>1 amortizes the loop's
    # per-iteration overhead (~43 us/step measured on v5e) over U steps at
    # <=U-1 wasted post-finish steps per chunk; results identical for any U
    # (decode/beam.py). U=4 wins when chunk trip counts are ~>=16.
    beam_unroll: int = 1
    # Two-phase straggler-compacted beam decode (decode/beam.py
    # beam_search_two_phase): every chunk decodes to `split_len`, then the
    # unfinished sentences are re-packed on device into few straggler
    # chunks that alone resume to max_len. Exact (parity-tested). Wins when
    # per-chunk trips >> mean hypothesis length (the IKEA long-caption
    # regime: trips ~121 vs mean 23.7); loses slightly in homogeneous short
    # regimes (Multi30k trips ~17). "auto" enables it when max_len >= 96;
    # "on"/"off" force. Env VAG_TWO_PHASE=on/off overrides for A/B.
    two_phase: str = "auto"
    # Phase-1 step cap L1 for the two-phase decode; 0 -> max(16, max_len//4).
    split_len: int = 0
    # Beam termination semantic (decode/beam.py):
    #   "all_frozen" (default): a sentence decodes until ALL K beams hold
    #     finished hypotheses (frozen hyps keep competing in top-k at their
    #     final score). Most conservative search; the fixed-seed goldens pin
    #     it. On fuzzy posteriors (under-trained / long-caption regimes) weak
    #     live beams can outscore their frozen siblings for hundreds of
    #     steps, so sentences run to max_len (measured: IKEA exercise chunks
    #     all ran 128/128 trips while mean BEST-hyp length was 29).
    #   "eos_top": a sentence stops as soon as its top-RANKED hypothesis is
    #     finished (the 2018-era PyTorch beam implementations' termination:
    #     OpenNMT-py Beam.done / dl4mt gen_sample stop within a few steps of
    #     the best hypothesis finishing); unfinished lower beams are masked
    #     out of the final ranking. [LOW-CONF which variant the reference
    #     uses — mount empty; results differ only when continued search
    #     would find a better-normalized hypothesis after the top froze.]
    beam_finish: str = "all_frozen"
    # Exact admissible beam pruning (decode/beam.py _make_body_1): freeze a
    # sentence's live beams once their best-achievable normalized score
    # (raw/cap**alpha; raw only decreases) is strictly below the worst
    # already-frozen hypothesis's normalized score — they provably cannot
    # change the ranking of any completed hypothesis. Best hypothesis and
    # all completed hypotheses are bit-identical with pruning on/off (proof
    # in beam.py; parity-tested); only the truncation point of provably-
    # losing incomplete tail hypotheses changes. Regime (measured, IKEA
    # exercise r4): the bound fires only on FAST-DECAYING live beams; a
    # confident repetition loop decays slower per token than the frozen
    # hypotheses' average, so its ceiling raw/cap**alpha stays competitive
    # and no exact rule may remove it (r/cap**alpha is the tightest
    # model-free bound). Blocking repetitions (block_ngram) forces such
    # loops into the fast-decay regime where this prune then freezes them
    # — the two knobs compose. "on" (default) / "off"; env VAG_BEAM_PRUNE
    # overrides for A/B. No-op when length_norm_alpha < 0.
    beam_prune: str = "on"
    # No-repeat n-gram blocking (fairseq/Paulus-2017 semantics): a
    # candidate token is banned (log-prob forced to -inf) when it would
    # complete an n-gram already present in that beam's own hypothesis.
    # 0 (default) disables. SEMANTIC knob — outputs change by design (the
    # production cure for degenerate repetition loops, which under
    # length normalization can legitimately outscore real hypotheses and
    # pin long-max_len decodes; see docs/usage.md "IKEA regime"). The ban
    # streams into the fused readout->top-k kernel as a dense vocab mask
    # (r4; previously forced the unfused path — kernel mask measured
    # 1.27x faster end-to-end, benchmarks/block_ab.py); env
    # VAG_BLOCK_NGRAM=N overrides for A/B.
    block_ngram: int = 0
    # Source-relative decode length cap (marian's max-length-factor): row i
    # freezes at step ceil(max_len_factor * src_len_i) + max_len_offset
    # (clamped to [1, max_len]). 0.0 disables (default — the reference uses
    # a flat max_len). Bounds the cost of degenerate never-finishing beams
    # by each row's own source length instead of the global max_len;
    # per-ROW semantics, so results are independent of chunk packing and
    # compose with the two-phase decode.
    max_len_factor: float = 0.0
    max_len_offset: int = 0
    # Decode-side compute dtype override ("" = inherit model.compute_dtype).
    # Default float32: the decode hot loop is LATENCY-bound (640-row
    # matmuls), where bf16's per-step dtype conversions cost more than its
    # bandwidth saves — same-checkpoint interleaved end-to-end A/B on v5e
    # measured fp32 decode +4.4% median (19.6k vs 18.8k sent/s, 6/7 reps;
    # r4 dec_step_bench found the same at the microbench level: 73.9 vs
    # 104.3 us/step at T=32). Training keeps bf16 where it wins (the
    # 1.60x Pallas dec-scan regime); numerics at fp32 are strictly
    # tighter. Set "bfloat16" to decode in bf16 (e.g. to A/B, or on
    # HBM-bound vocab shapes where streaming weights dominate).
    compute_dtype: str = "float32"
    # Streaming-refill decode (decode/beam.py beam_search_streaming):
    # continuous batching for beam search — one while_loop over a fixed
    # working set that refills finished rows from the corpus pool. Exact
    # (parity-tested). Auto resolves OFF: the offline fused path sorts by
    # source length, which makes per-chunk service times near-homogeneous,
    # and streaming measured NO trip reduction there at ~10-20% extra
    # per-step cost (see beam_search_streaming's docstring for numbers).
    # Opt in ("on" / env VAG_STREAM_DECODE) for unsorted or online
    # workloads, where chunk quantization costs ~max_len per mixed chunk.
    # Takes precedence over two_phase when both resolve on.
    streaming: str = "auto"
    # Refill hysteresis: refill when >= this many working rows finished
    # (0 -> rows//4). Lower = tighter packing but more compaction events.
    refill_threshold: int = 0


@dataclass(frozen=True)
class MeshConfig:
    """Device mesh axes. data = batch sharding (DP); model = vocab/embedding
    sharding (TP, used by the scaled preset). PP/EP/SP are N/A for this model
    family (SURVEY.md §2 'Parallelism strategies')."""

    data_axis: int = -1             # -1: all available devices
    model_axis: int = 1


@dataclass(frozen=True)
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    decode: DecodeConfig = field(default_factory=DecodeConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    name: str = "custom"

    # ---- (de)serialization -------------------------------------------------
    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2)

    @staticmethod
    def from_dict(d: Dict[str, Any]) -> "Config":
        def build(cls, sub):
            fields = {f.name: f for f in dataclasses.fields(cls)}
            kwargs = {}
            for k, v in sub.items():
                if k not in fields:
                    raise KeyError(f"unknown config key {cls.__name__}.{k}")
                if isinstance(v, list):
                    v = tuple(v)
                kwargs[k] = v
            return cls(**kwargs)

        return Config(
            model=build(ModelConfig, d.get("model", {})),
            data=build(DataConfig, d.get("data", {})),
            train=build(TrainConfig, d.get("train", {})),
            decode=build(DecodeConfig, d.get("decode", {})),
            mesh=build(MeshConfig, d.get("mesh", {})),
            name=d.get("name", "custom"),
        )

    @staticmethod
    def from_json(s: str) -> "Config":
        return Config.from_dict(json.loads(s))

    def replace(self, **section_updates) -> "Config":
        """cfg.replace(model={'emb_dim': 512}, name='x') — section-wise update."""
        new = {}
        for key, val in section_updates.items():
            cur = getattr(self, key)
            if isinstance(val, dict):
                new[key] = dataclasses.replace(cur, **val)
            else:
                new[key] = val
        return dataclasses.replace(self, **new)


def _base(name: str, **sections) -> Config:
    return Config(name=name).replace(**sections)


# The five BASELINE.json configs (verified local; SURVEY.md §6).
PRESETS: Dict[str, Config] = {
    # 1. Text-only NMT baseline: 1-layer GRU 256d, Multi30k EN→DE, greedy, CPU-runnable.
    "m30k_ende_text": _base(
        "m30k_ende_text",
        model=dict(multimodal=False, emb_dim=256, hidden_dim=256,
                   dec_hidden_dim=256, attn_dim=256, enc_layers=1),
        data=dict(dataset="multi30k", src_lang="en", tgt_lang="de"),
        decode=dict(beam_size=1),
    ),
    # 2. VAG-NMT EN→DE: pool5 features + max-margin grounding loss.
    "m30k_ende_vag": _base(
        "m30k_ende_vag",
        model=dict(multimodal=True, emb_dim=256, hidden_dim=512,
                   dec_hidden_dim=512, attn_dim=512, enc_layers=1,
                   shared_dim=512),
        data=dict(dataset="multi30k", src_lang="en", tgt_lang="de"),
        decode=dict(beam_size=5),
    ),
    # 3. VAG-NMT EN→FR with batched beam search + image-guided decoder init.
    "m30k_enfr_vag": _base(
        "m30k_enfr_vag",
        model=dict(multimodal=True, emb_dim=256, hidden_dim=512,
                   dec_hidden_dim=512, attn_dim=512, enc_layers=1,
                   shared_dim=512),
        data=dict(dataset="multi30k", src_lang="en", tgt_lang="fr"),
        decode=dict(beam_size=5),
    ),
    # 4. IKEA product descriptions: long noisy captions, larger vocab.
    "ikea_vag": _base(
        "ikea_vag",
        model=dict(multimodal=True, emb_dim=256, hidden_dim=512,
                   dec_hidden_dim=512, attn_dim=512, enc_layers=1,
                   shared_dim=512, src_vocab_size=16000, tgt_vocab_size=16000),
        data=dict(dataset="ikea", max_src_len=128, max_tgt_len=128,
                  bpe_merges=16000,
                  length_buckets=(16, 32, 48, 64, 96, 128)),
        decode=dict(beam_size=5, max_len=128),
    ),
    # 5. Scaled: 2-layer GRU 512d + shared-embedding retrieval eval on test2017.
    "m30k_scaled": _base(
        "m30k_scaled",
        model=dict(multimodal=True, emb_dim=512, hidden_dim=512,
                   dec_hidden_dim=512, attn_dim=512, enc_layers=2,
                   shared_dim=512),
        data=dict(dataset="multi30k", src_lang="en", tgt_lang="de"),
        decode=dict(beam_size=5),
        mesh=dict(model_axis=1),  # raise to enable vocab/embedding TP sharding
    ),
    # Tiny CPU-fast config used by tests and toy overfit runs.
    "toy": _base(
        "toy",
        model=dict(multimodal=True, src_vocab_size=64, tgt_vocab_size=64,
                   emb_dim=32, hidden_dim=32, dec_hidden_dim=32, attn_dim=32,
                   shared_dim=32, img_feat_dim=64, dropout=0.0),
        data=dict(dataset="toy", batch_size=16, max_src_len=16, max_tgt_len=16,
                  length_buckets=(8, 16)),
        decode=dict(beam_size=3, max_len=16, decode_batch_size=16),
        # steps_per_dispatch=1: K-stacks group same-bucket batches, and on a
        # corpus this tiny (25 batches/epoch over 4 shapes) the correlated
        # runs measurably slow early convergence (400-step dev BLEU 95 at
        # K=1 vs 82-86 at K=4/8); at Multi30k scale the effect vanishes
        # (K=8 trained to a slightly HIGHER dev BLEU than before).
        train=dict(learning_rate=3e-3, eval_every_steps=200,
                   steps_per_dispatch=1),
    ),
}


def preset(name: str) -> Config:
    if name not in PRESETS:
        raise KeyError(f"unknown preset {name!r}; have {sorted(PRESETS)}")
    return PRESETS[name]
