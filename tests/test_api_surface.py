"""Public API surface: every name the CLI and README rely on must import.
(The retrieval CLI once broke because embeddings_for_retrieval was not
re-exported from vag_nmt_tpu.models — this test pins the whole surface.)"""

import importlib

import pytest

SURFACE = {
    "vag_nmt_tpu.models": [
        "DecodeState", "decode_step", "embeddings_for_retrieval",
        "init_params", "loss_fn", "prepare_decode",
    ],
    "vag_nmt_tpu.decode": [
        "greedy_decode", "beam_search", "translate_corpus",
        "build_img_table", "Translator",
    ],
    "vag_nmt_tpu.data": ["device_prefetch"],
    "vag_nmt_tpu.core.config": [
        "Config", "ModelConfig", "preset", "PRESETS",
        "PAD_ID", "UNK_ID", "SOS_ID", "EOS_ID",
    ],
    "vag_nmt_tpu.parallel.sharding": [
        "make_mesh", "batch_sharding", "param_shardings", "replicated",
        "host_shard",
    ],
    "vag_nmt_tpu.train.loop": ["train_loop"],
    "vag_nmt_tpu.train.step": ["make_train_step", "make_eval_step"],
    "vag_nmt_tpu.train.checkpoint": [
        "save_checkpoint", "load_checkpoint", "has_checkpoint",
    ],
    "vag_nmt_tpu.evaluation.bleu": ["corpus_bleu"],
    "vag_nmt_tpu.evaluation.meteor": ["meteor_score"],
    "vag_nmt_tpu.evaluation.retrieval": ["retrieval_recall"],
    "vag_nmt_tpu.ops.gru": ["gru_scan", "gru_cell", "bidirectional_gru"],
    "vag_nmt_tpu.ops.pallas_gru": ["pallas_gru_scan"],
    "vag_nmt_tpu.ops.pallas_topk": ["beam_topk"],
    "vag_nmt_tpu.core.profiling": ["maybe_trace", "step_annotation"],
}


@pytest.mark.parametrize("module,names", sorted(SURFACE.items()))
def test_public_names_importable(module, names):
    mod = importlib.import_module(module)
    for name in names:
        assert hasattr(mod, name), f"{module}.{name} missing"


def test_cli_commands_registered():
    from vag_nmt_tpu.cli import build_parser

    p = build_parser()
    subs = next(a for a in p._actions
                if a.__class__.__name__ == "_SubParsersAction")
    cmds = set(subs.choices)
    assert {"preprocess", "train", "translate", "translate-text", "score",
            "retrieval", "extract-features", "make-toy"} <= cmds
