"""Byte-pair encoding, subword-nmt semantics (SURVEY.md C1).

The reference preprocesses with the external ``subword-nmt`` package (~10k
merges). This is a self-contained reimplementation of the same algorithm:

- learn: iteratively merge the most frequent adjacent symbol pair over a word
  frequency dict; word symbols are characters with '</w>' appended to the last;
- apply: repeatedly merge the LOWEST-RANK pair present in the word (greedy by
  merge priority, exactly subword-nmt's application rule);
- output: '@@'-continuation convention ('foo' -> 'fo@@ o'), reversed by
  ``remove_bpe``.

A C++ fast path for `encode_line` lives in native/bpe_apply.cpp (optional,
ctypes-loaded); the Python path is the semantics oracle.
"""

from __future__ import annotations

import heapq
import json
from collections import Counter, defaultdict
from typing import Dict, Iterable, List, Sequence, Tuple

END = "</w>"


def _word_symbols(word: str) -> Tuple[str, ...]:
    if not word:
        return ()
    return tuple(word[:-1]) + (word[-1] + END,)


class _RevPair:
    """Heap tie-break helper: orders pairs REVERSE-lexicographically so the
    lazy max-heap reproduces the original deterministic rule exactly
    (max count, ties by lexicographically LARGEST pair)."""

    __slots__ = ("p",)

    def __init__(self, p):
        self.p = p

    def __lt__(self, other):
        return self.p > other.p


def learn_bpe(word_freqs: Dict[str, int], num_merges: int) -> List[Tuple[str, str]]:
    """Learn merge operations from a word frequency dict.

    Incremental pair statistics (subword-nmt's approach): each merge touches
    only the word types containing the merged pair and updates a lazy
    max-heap, instead of rescanning every word type per merge — 16k merges
    over a long-caption corpus drop from ~25 min to seconds. Semantics are
    IDENTICAL to the naive rescan (deterministic tie-break included;
    equivalence-tested in tests/test_data.py)."""
    words: List[List[str]] = []
    freqs: List[int] = []
    for w, f in word_freqs.items():
        if w:
            words.append(list(_word_symbols(w)))
            freqs.append(f)

    pair_counts: Counter = Counter()
    pair_words = defaultdict(set)            # pair -> word indices (lazy)
    for idx, syms in enumerate(words):
        f = freqs[idx]
        for a, b in zip(syms, syms[1:]):
            pair_counts[(a, b)] += f
            pair_words[(a, b)].add(idx)

    heap = [(-c, _RevPair(p), p) for p, c in pair_counts.items()]
    heapq.heapify(heap)

    def push(p):
        heapq.heappush(heap, (-pair_counts[p], _RevPair(p), p))

    merges: List[Tuple[str, str]] = []
    while len(merges) < num_merges and heap:
        negc, _, best = heapq.heappop(heap)
        cur = pair_counts.get(best, 0)
        if -negc != cur:                      # stale heap entry
            if cur > 0:
                push(best)
            continue
        if cur < 2:
            break
        merges.append(best)
        merged = best[0] + best[1]
        touched = set()
        for idx in pair_words.pop(best, ()):
            syms = words[idx]
            f = freqs[idx]
            has = any(a == best[0] and b == best[1]
                      for a, b in zip(syms, syms[1:]))
            if not has:
                continue                      # stale index
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] -= f
            out: List[str] = []
            i = 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == best[0]
                        and syms[i + 1] == best[1]):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[idx] = out
            for a, b in zip(out, out[1:]):
                pair_counts[(a, b)] += f
                pair_words[(a, b)].add(idx)
                touched.add((a, b))
            for a, b in zip(syms, syms[1:]):
                touched.add((a, b))
        pair_counts.pop(best, None)
        touched.discard(best)
        for p in touched:
            c = pair_counts.get(p, 0)
            if c <= 0:
                pair_counts.pop(p, None)
                pair_words.pop(p, None)
            else:
                push(p)                        # lazy: stale entries skipped
    return merges


def learn_bpe_from_lines(lines: Iterable[Sequence[str]],
                         num_merges: int) -> List[Tuple[str, str]]:
    """Learn from pre-tokenized lines (lists of tokens)."""
    freqs: Counter = Counter()
    for toks in lines:
        freqs.update(toks)
    return learn_bpe(dict(freqs), num_merges)


def _load_native():
    """ctypes handle to native/libbpe_apply.so, or None (pure-Python path)."""
    import ctypes
    import os

    so = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "native", "libbpe_apply.so")
    if not os.path.exists(so):
        return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    lib.bpe_new.restype = ctypes.c_void_p
    lib.bpe_new.argtypes = [ctypes.c_char_p, ctypes.c_long]
    lib.bpe_free.argtypes = [ctypes.c_void_p]
    lib.bpe_encode_line.restype = ctypes.c_long
    lib.bpe_encode_line.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                    ctypes.c_char_p, ctypes.c_long]
    return lib


_NATIVE = _load_native()


class BPE:
    """Apply learned merges to tokens/lines, with a per-word cache.

    When native/libbpe_apply.so is built (make -C native), whole-line
    application runs through the C++ fast path; the Python implementation is
    the semantics oracle (tests assert identical output)."""

    def __init__(self, merges: Sequence[Tuple[str, str]],
                 use_native: bool = True):
        self.merges = [tuple(m) for m in merges]
        self.ranks = {tuple(m): i for i, m in enumerate(self.merges)}
        self._cache: Dict[str, Tuple[str, ...]] = {}
        self._nat = None
        if use_native and _NATIVE is not None:
            blob = "".join(f"{a}\t{b}\n" for a, b in self.merges).encode()
            self._nat = _NATIVE.bpe_new(blob, len(blob))

    def __del__(self):
        nat = getattr(self, "_nat", None)
        if nat is not None and _NATIVE is not None:
            _NATIVE.bpe_free(nat)

    def encode_line(self, line: str) -> List[str]:
        """Whitespace-tokenized line -> BPE units (native fast path)."""
        if self._nat is not None:
            import ctypes

            raw = line.encode("utf-8")
            cap = max(4096, 4 * len(raw) + 64)
            buf = ctypes.create_string_buffer(cap)
            n = _NATIVE.bpe_encode_line(self._nat, raw, buf, cap)
            if n >= 0:
                s = buf.raw[:n].decode("utf-8")
                return s.split(" ") if s else []
        return self.encode_tokens(line.split())

    def segment_word(self, word: str) -> Tuple[str, ...]:
        if word in self._cache:
            return self._cache[word]
        syms = list(_word_symbols(word))
        while len(syms) > 1:
            # lowest-rank pair present
            best_rank, best_i = None, -1
            for i in range(len(syms) - 1):
                r = self.ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                break
            pair = (syms[best_i], syms[best_i + 1])
            merged = pair[0] + pair[1]
            # merge ALL occurrences of this pair (subword-nmt rule)
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == pair[0]
                        and syms[i + 1] == pair[1]):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        units = []
        for i, s in enumerate(syms):
            if s.endswith(END):
                units.append(s[: -len(END)])
            else:
                units.append(s + "@@")
        units = tuple(u for u in units if u)  # drop empty from bare '</w>'
        self._cache[word] = units
        return units

    def encode_tokens(self, tokens: Sequence[str]) -> List[str]:
        out: List[str] = []
        for t in tokens:
            out.extend(self.segment_word(t))
        return out

    # ---- persistence --------------------------------------------------------
    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump({"merges": self.merges}, f)

    @staticmethod
    def load(path: str) -> "BPE":
        with open(path) as f:
            return BPE([tuple(m) for m in json.load(f)["merges"]])


def remove_bpe(tokens: Sequence[str]) -> List[str]:
    """Merge '@@'-continued units back into words."""
    out: List[str] = []
    buf = ""
    for t in tokens:
        if t.endswith("@@"):
            buf += t[:-2]
        else:
            out.append(buf + t)
            buf = ""
    if buf:
        out.append(buf)
    return out
