"""Config tree: preset integrity, JSON round-trip, CLI-style overrides."""

import pytest

from vag_nmt_tpu.core.config import Config, PRESETS, preset


def test_all_presets_roundtrip_json():
    for name in PRESETS:
        cfg = preset(name)
        back = Config.from_json(cfg.to_json())
        assert back == cfg, name


def test_baseline_configs_present():
    """The five BASELINE.json configs (SURVEY.md §6) all have presets."""
    assert preset("m30k_ende_text").model.multimodal is False
    assert preset("m30k_ende_text").decode.beam_size == 1
    assert preset("m30k_ende_vag").model.multimodal
    assert preset("m30k_enfr_vag").data.tgt_lang == "fr"
    ikea = preset("ikea_vag")
    assert ikea.data.dataset == "ikea" and ikea.model.src_vocab_size == 16000
    scaled = preset("m30k_scaled")
    assert scaled.model.enc_layers == 2 and scaled.model.emb_dim == 512


def test_replace_sectionwise():
    cfg = preset("toy").replace(model=dict(emb_dim=64), name="x")
    assert cfg.model.emb_dim == 64 and cfg.name == "x"
    assert cfg.model.hidden_dim == preset("toy").model.hidden_dim


def test_unknown_key_rejected():
    with pytest.raises(KeyError):
        Config.from_dict({"model": {"nope": 1}})


def test_cli_set_override_with_json_list_stays_hashable():
    """Review finding (reproduced): --set with a JSON list produced an
    unhashable Config (frozen dataclass holding a list), crashing the
    lru_cache-keyed decode factories. Lists must become tuples."""
    from vag_nmt_tpu.cli import _parse_overrides
    from vag_nmt_tpu.core.config import preset

    ov = _parse_overrides(["data.length_buckets=[8,16]"])
    cfg = preset("toy").replace(**ov)
    assert cfg.data.length_buckets == (8, 16)
    hash(cfg)  # must not raise
