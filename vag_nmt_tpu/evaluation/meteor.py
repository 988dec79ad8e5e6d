"""METEOR scoring (SURVEY.md C14) — the flagged exact-parity risk.

The reference spawns the Java METEOR-1.5 jar. Two paths here:

1. If the jar is available (``METEOR_JAR`` env var or an explicit path),
   spawn ``java -jar meteor.jar hyp ref -l <lang> -norm`` and parse its final
   score — exact parity.
2. Otherwise a pure-Python approximation: greedy unigram alignment in two
   stages (exact match, then language-crude suffix-stem match), standard
   METEOR harmonic mean + fragmentation penalty. Parameters are the classic
   METEOR defaults (alpha=0.9, beta=3.0, gamma=0.5), NOT the per-language
   tuned METEOR-1.5 weights — expect small deviations; treat python-mode
   scores as relative, not citable. SURVEY.md §7 hard-part 3.
"""

from __future__ import annotations

import os
import re
import subprocess
import tempfile
from typing import List, Optional, Sequence

ALPHA, BETA, GAMMA = 0.9, 3.0, 0.5
_SUFFIXES = ("erinnen", "erin", "ungen", "ung", "tion", "ment", "ness", "ches",
             "che", "ers", "er", "es", "en", "e", "s", "n")


def _stem(tok: str) -> str:
    for s in _SUFFIXES:
        if tok.endswith(s) and len(tok) - len(s) >= 3:
            return tok[: -len(s)]
    return tok


def _align(hyp: List[str], ref: List[str]):
    """Greedy two-stage alignment. Returns list of (hyp_idx, ref_idx)."""
    matches = []
    used_h, used_r = set(), set()
    for keyfn in (lambda t: t, _stem):
        ref_map = {}
        for j, r in enumerate(ref):
            if j not in used_r:
                ref_map.setdefault(keyfn(r), []).append(j)
        for i, h in enumerate(hyp):
            if i in used_h:
                continue
            cands = ref_map.get(keyfn(h))
            if cands:
                j = cands.pop(0)
                matches.append((i, j))
                used_h.add(i)
                used_r.add(j)
    return sorted(matches)


def _chunks(matches) -> int:
    if not matches:
        return 0
    ch = 1
    for (h0, r0), (h1, r1) in zip(matches, matches[1:]):
        if h1 != h0 + 1 or r1 != r0 + 1:
            ch += 1
    return ch


def _sentence_stats(hyp: List[str], ref: List[str]):
    matches = _align(hyp, ref)
    m = len(matches)
    return m, _chunks(matches), len(hyp), len(ref)


def meteor_score(
    hypotheses: Sequence[str],
    references: Sequence[str],
    lang: str = "de",
    jar: Optional[str] = None,
) -> float:
    """Corpus METEOR in [0, 1]. Uses the jar when available (exact parity)."""
    jar = jar or os.environ.get("METEOR_JAR", "")
    if jar and os.path.exists(jar):
        return _meteor_jar(hypotheses, references, lang, jar)

    # Python approximation: aggregate sufficient statistics over the corpus
    # (METEOR aggregates m/chunks/lengths corpus-level before the formula).
    M = CH = HL = RL = 0
    for h, r in zip(hypotheses, references):
        m, ch, hl, rl = _sentence_stats(h.split(), r.split())
        M, CH, HL, RL = M + m, CH + ch, HL + hl, RL + rl
    if M == 0 or HL == 0 or RL == 0:
        return 0.0
    p = M / HL
    r = M / RL
    fmean = p * r / (ALPHA * p + (1 - ALPHA) * r)
    penalty = GAMMA * (CH / M) ** BETA
    return fmean * (1.0 - penalty)


def _meteor_jar(hyps, refs, lang, jar) -> float:
    with tempfile.TemporaryDirectory() as d:
        hp, rp = os.path.join(d, "hyp"), os.path.join(d, "ref")
        for path, lines in ((hp, hyps), (rp, refs)):
            with open(path, "w", encoding="utf-8") as f:
                f.write("\n".join(lines) + "\n")
        out = subprocess.run(
            ["java", "-Xmx2G", "-jar", jar, hp, rp, "-l", lang, "-norm"],
            capture_output=True, text=True, check=True).stdout
    m = re.search(r"Final score:\s*([\d.]+)", out)
    if not m:
        raise RuntimeError(f"could not parse METEOR output:\n{out[-500:]}")
    return float(m.group(1))
