"""C++ BPE fast path vs the Python semantics oracle (native/bpe_apply.cpp)."""

import os
import subprocess

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def native_bpe():
    so = os.path.join(REPO, "native", "libbpe_apply.so")
    if not os.path.exists(so):
        r = subprocess.run(["make", "-C", os.path.join(REPO, "native")],
                           capture_output=True)
        if r.returncode != 0 or not os.path.exists(so):
            pytest.skip("native BPE lib not buildable here")
    import vag_nmt_tpu.data.bpe as bpe_mod

    if bpe_mod._NATIVE is None:
        bpe_mod._NATIVE = bpe_mod._load_native()
    if bpe_mod._NATIVE is None:
        pytest.skip("native BPE lib failed to load")
    return bpe_mod


def test_native_matches_python_random_corpus(native_bpe):
    from vag_nmt_tpu.data.bpe import BPE, learn_bpe_from_lines

    rng = np.random.RandomState(0)
    alphabet = list("abcdefgh") + ["ü", "ß", "é"]
    lines = []
    for _ in range(200):
        lines.append([
            "".join(rng.choice(alphabet, rng.randint(1, 9)))
            for _ in range(rng.randint(1, 12))
        ])
    merges = learn_bpe_from_lines(lines, 120)
    nat = BPE(merges)
    py = BPE(merges, use_native=False)
    assert nat._nat is not None, "native path not active"
    for toks in lines:
        line = " ".join(toks)
        assert nat.encode_line(line) == py.encode_tokens(toks)


def test_native_handles_empty_and_whitespace(native_bpe):
    from vag_nmt_tpu.data.bpe import BPE

    nat = BPE([("a", "b")])
    assert nat.encode_line("") == []
    assert nat.encode_line("   ") == []
    assert nat.encode_line("ab") == ["ab"] or nat.encode_line("ab")
