"""Host-side tokenization (SURVEY.md C1).

The reference shells out to the Moses Perl tokenizer; this is a pure-Python
Moses-lite equivalent: lowercase (the reference lowercases Multi30k), split
words from punctuation, keep intra-word apostrophes/hyphens together. Exact
Moses parity is NOT claimed — what matters for BLEU parity is that train and
eval text pass through the SAME tokenizer, which they do here."""

from __future__ import annotations

import re
from typing import List

# words (incl. internal ' and -), numbers, or single punctuation marks
_TOKEN_RE = re.compile(r"[\w]+(?:['\-][\w]+)*|[^\w\s]", re.UNICODE)


def tokenize(line: str, lower: bool = True) -> List[str]:
    if lower:
        line = line.lower()
    return _TOKEN_RE.findall(line)


def detokenize(tokens: List[str]) -> str:
    """Inverse-ish of tokenize for display: attach punctuation to the left."""
    out = ""
    for tok in tokens:
        if out and (re.match(r"[^\w]", tok) and tok not in "([{«"):
            out += tok
        else:
            out += (" " if out else "") + tok
    return out
