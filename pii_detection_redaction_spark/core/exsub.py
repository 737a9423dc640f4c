"""Exact-substring dedup spec — the ExactSubstr operator of Lee et al. 2021
("Deduplicating Training Data Makes Language Models Better",
arXiv:2107.06499): any run of >= K tokens that occurs more than once in the
corpus is removed from every occurrence EXCEPT one canonical keeper.

The paper builds a corpus-wide suffix array; the Spark re-expression
(``operators.exsub``) uses fixed-length token windows instead: every K-token
window is keyed by the portable ``core.hashing.hash64`` of its lowercased
space-joined tokens, a window key occurring >1 times marks all its
non-keeper occurrences, and each document excises the merged union of its
marked spans. A duplicated run of L >= K tokens produces L-K+1 overlapping
marked windows that merge into the single maximal span — the suffix-array
semantics at K-token resolution, embarrassingly parallel per doc plus one
key-count shuffle.

Keeper rule (determinism): the occurrence with the smallest (doc_id, start)
pair, compared lexicographically — corpus-order-free and engine-agnostic.

This module is the pure-Python half: spec constants, the window/merge/excise
primitives, and the corpus-level reference implementation the golden-parquet
oracle materializes. No reference-repo counterpart (north-rule training-data
operator).
"""

from __future__ import annotations

import re
from typing import Dict, Iterable, List, Tuple

from .casefold import NONSPACE_RUN, simple_lower

EXSUB_K = 20  # window length in tokens (paper uses 50; corpus docs are short)

_tok_re = re.compile(NONSPACE_RUN)  # engine-portable \S+ (core.casefold)


def token_spans(text: str) -> List[Tuple[str, int, int]]:
    """(lowercased token, char start, char end) — spans index the ORIGINAL
    text; lowercasing makes window keys case-insensitive (the repo's
    tokenize convention)."""
    # simple_lower (one-char İ rule, core.casefold); İ→i is length-preserving
    # so the spans still index the ORIGINAL text.
    return [
        (simple_lower(m.group(0)), m.start(), m.end())
        for m in _tok_re.finditer(text)
    ]


_ROLL_B = 0x100000001B3  # FNV-ish odd multiplier; invertible mod 2^64
_U64 = (1 << 64) - 1


def window_entries(text: str, k: int = EXSUB_K) -> List[Tuple[int, int, int]]:
    """(key, start, end) per K-token window; key = polynomial rolling hash
    (base ``_ROLL_B`` mod 2^64) over the tokens' ``hash64`` values, viewed
    two's-complement (Spark LongType). One md5 per TOKEN plus O(1) per
    window — the md5-per-window form costs O(tokens * K) hashing, which at
    100 TB is the operator's whole budget. Window equality still implies
    token-sequence equality up to 64-bit collisions (the same assumption
    every suffix-array/fingerprint dedup tool makes); both the Spark UDF
    and the golden oracle consume THIS function, so the key definition
    cannot fork."""
    from .hashing import hash64

    toks = token_spans(text)
    n = len(toks)
    if n < k:
        return []
    th = [hash64(t[0]) for t in toks]
    pow_k = pow(_ROLL_B, k - 1, 1 << 64)
    h = 0
    for j in range(k):
        h = (h * _ROLL_B + th[j]) & _U64
    out = []
    for i in range(n - k + 1):
        if i:
            h = ((h - th[i - 1] * pow_k) * _ROLL_B + th[i + k - 1]) & _U64
        key = h - (1 << 64) if h >= (1 << 63) else h
        out.append((key, toks[i][1], toks[i + k - 1][2]))
    return out


def merge_spans(spans: Iterable[Tuple[int, int]]) -> List[Tuple[int, int]]:
    """Union of char ranges (touching ranges merge)."""
    out: List[Tuple[int, int]] = []
    for s, e in sorted(spans):
        if out and s <= out[-1][1]:
            out[-1] = (out[-1][0], max(out[-1][1], e))
        else:
            out.append((s, e))
    return out


def excise(text: str, spans: Iterable[Tuple[int, int]]) -> Tuple[str, int]:
    """Remove the merged spans from the text; returns (clean, chars_removed).
    Plain excision — no whitespace re-normalization — so the result is a
    pure function of (text, spans)."""
    merged = merge_spans(spans)
    parts, pos = [], 0
    for s, e in merged:
        parts.append(text[pos:s])
        pos = e
    parts.append(text[pos:])
    return "".join(parts), sum(e - s for s, e in merged)


def exsub_clean(
    docs: Iterable[Tuple[str, str]], k: int = EXSUB_K
) -> Dict[str, Tuple[str, int, int]]:
    """Reference implementation over a whole (small) corpus:
    doc_id -> (clean_text, n_chars_removed, n_dup_windows)."""
    texts = dict(docs)
    occs: Dict[int, List[Tuple[str, int, int]]] = {}
    for doc_id, text in texts.items():
        for key, s, e in window_entries(text or "", k):
            occs.setdefault(key, []).append((doc_id, s, e))
    marked: Dict[str, List[Tuple[int, int]]] = {}
    for key, lst in occs.items():
        if len(lst) < 2:
            continue
        keeper = min((d, s) for d, s, _ in lst)
        for d, s, e in lst:
            if (d, s) != keeper:
                marked.setdefault(d, []).append((s, e))
    out = {}
    for doc_id, text in texts.items():
        spans = marked.get(doc_id, [])
        clean, removed = excise(text or "", spans)
        out[doc_id] = (clean, removed, len(spans))
    return out
