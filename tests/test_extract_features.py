"""Feature-extraction ORCHESTRATION (SURVEY.md C2/§3.4, VERDICT r1 item 9):
image-list -> paths -> feature matrix -> checksummed sidecar, and the
alignment guards. The ResNet forward itself is monkeypatched (no weights in
this sandbox); the list/corpus alignment logic is where the silent-corruption
hazard lives."""

import json
import os

import numpy as np
import pytest

import vag_nmt_tpu.data.extract_features as ef
from vag_nmt_tpu.data.features import load_features


@pytest.fixture()
def image_setup(tmp_path, monkeypatch):
    from PIL import Image

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    names = [f"img_{i}.png" for i in range(5)]
    for i, n in enumerate(names):
        Image.new("RGB", (2, 2), color=(i * 40, 0, 0)).save(img_dir / n)
    (tmp_path / "images.txt").write_text("\n".join(names) + "\n")
    (tmp_path / "corpus.en").write_text(
        "\n".join(f"sentence {i}" for i in range(5)) + "\n")

    seen = {}

    def fake_extract(paths, batch_size=32, device="cpu"):
        # deterministic row per path; records call order for the test
        seen["paths"] = list(paths)
        out = np.zeros((len(paths), 8), np.float32)
        for r, p in enumerate(paths):
            out[r] = hash(os.path.basename(p)) % 1000
        return out

    monkeypatch.setattr(ef, "extract_resnet50_pool5", fake_extract)
    return tmp_path, names, seen


def test_extract_to_file_writes_aligned_features(image_setup):
    tmp, names, seen = image_setup
    out = str(tmp / "train_features.npy")
    ef.extract_to_file(str(tmp / "imgs"), str(tmp / "images.txt"), out,
                       corpus_path=str(tmp / "corpus.en"))
    # paths passed in LIST order (row i = corpus line i)
    assert [os.path.basename(p) for p in seen["paths"]] == names
    assert os.path.exists(out) and os.path.exists(out + ".align.json")
    side = json.loads(open(out + ".align.json").read())
    assert side["rows"] == 5

    # loader verifies the alignment checksum against the same corpus
    lines = [f"sentence {i}" for i in range(5)]
    feats = load_features(out, expected_rows=5, corpus_lines=lines)
    assert feats.shape == (5, 8)

    # a shuffled corpus must be rejected (silent misalignment hazard)
    with pytest.raises(ValueError):
        load_features(out, expected_rows=5, corpus_lines=lines[::-1])


def test_extract_to_file_rejects_count_mismatch(image_setup):
    tmp, names, seen = image_setup
    (tmp / "short.en").write_text("only one line\n")
    with pytest.raises(ValueError, match="alignment"):
        ef.extract_to_file(str(tmp / "imgs"), str(tmp / "images.txt"),
                           str(tmp / "f.npy"), corpus_path=str(tmp / "short.en"))
    assert not os.path.exists(tmp / "f.npy")
