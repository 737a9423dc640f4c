"""Batched candidate scans for the recognizer bank (numpy, one pass).

``recognizers.analyze`` anchors most patterns at shared per-document
candidate positions instead of running each regex over the whole text:
digit-run starts (digit-anchored numeric patterns), capitalized tokens
(gazetteer ``token_prefilter`` patterns), and starts of long ``[A-Z0-9]``
runs (the one alphanumeric pattern, ``driver_license_general``, that
otherwise pays a full-text scan per document). It also evaluates any-of
literal precondition gates (title/role/greeting/org/state/month covers)
with one ``str.__contains__`` scan per literal. Together those per-document
scans cost ~80us/doc of the fused UDF's hot path.

This module computes batch-level replacements in one vectorized pass: join
the batch with a separator that belongs to no class, decode once to a
uint32 codepoint array (the ``charclass_count_matrix`` technique in
``core.langid``), classify every codepoint with a bitmask LUT built FROM
the spec regexes themselves (membership exact by construction), and derive
run starts/ends with boolean-shift arithmetic. Each document gets a
``ScanBundle``:

- ``digit_starts`` / ``capwords`` / ``upper_run_starts`` — candidate
  *supersets*: ``analyze`` re-verifies every candidate with an anchored
  ``rx.match`` (which re-checks its own ``\\b``), so a bundle can only
  change WHERE the regexes are tried, never what they match.
- ``cw_prefixes`` — the set of 2-char ``[A-Z][a-z]`` capword heads present
  in the doc; a literal whose first two chars have that shape occurs in the
  text ONLY IF its head is in this set (the occurrence's first char is an
  ASCII upper followed by an ASCII lower, which is by definition a capword
  start), so membership is a sound O(1) prescreen before the full scan.
- ``uu_bigrams`` — same for consecutive-uppercase heads (acronym literals
  like ``NSW``; 2-char literals need no confirming scan at all).

Exact per-document equality with the ``re``/``str`` scans is pinned by
``tests/test_scanvec.py`` (corpus + adversarial fuzz).

Scale story: runs inside the Arrow UDF on executor workers, O(batch chars)
with small constants; no state beyond a 1 MB process-wide LUT.
"""

from __future__ import annotations

import re
from typing import List, Optional, Sequence, Tuple

import numpy as np

# The spec scans this module replicates (same objects analyze() falls back
# to when no bundle is supplied — single source of truth for the classes).
DIGIT_RUN_RE = re.compile(r"\d+")
CAPWORD_RE = re.compile(r"[A-Z][a-z]+")
# maximal [A-Z0-9] runs of length >= UPPER_RUN_MIN: every possible match
# start of \b[A-Z0-9]{6,10}\b is such a run's start (a match's predecessor
# is a non-word char, hence not in the class, so the start is run-initial;
# and the match consumes >= 6 class chars, so the run has length >= 6).
UPPER_RUN_MIN = 6
_UPPER_ALNUM_RE = re.compile(r"[A-Z0-9]")
_DIGIT_RE = re.compile(r"\d")
_UPPER_RE = re.compile(r"[A-Z]")
_LOWER_RE = re.compile(r"[a-z]")

_B_DIGIT, _B_UPPER, _B_LOWER, _B_UALNUM = 1, 2, 4, 8

_LUT: Optional[np.ndarray] = None


def _class_lut() -> np.ndarray:
    """uint8 class-bit LUT over all codepoints, built by running the spec
    regexes over every codepoint (exact membership by construction —
    ``langid.build_class_lut`` is the one builder)."""
    global _LUT
    if _LUT is None:
        from .langid import build_class_lut

        _LUT = build_class_lut(
            (
                (_B_DIGIT, _DIGIT_RE),
                (_B_UPPER, _UPPER_RE),
                (_B_LOWER, _LOWER_RE),
                (_B_UALNUM, _UPPER_ALNUM_RE),
            ),
            np.uint8,
        )
    return _LUT


class ScanBundle:
    """Per-document candidate positions (local offsets into the doc text)
    plus the literal-gate prescreen sets."""

    __slots__ = (
        "digit_starts",
        "capwords",
        "upper_run_starts",
        "cw_prefixes",
        "uu_bigrams",
    )

    def __init__(self, digit_starts, capwords, upper_run_starts, uu_bigrams):
        self.digit_starts = digit_starts  # List[int]
        self.capwords = capwords  # List[Tuple[int, str]]
        self.upper_run_starts = upper_run_starts  # List[int]
        self.cw_prefixes = {w[:2] for _, w in capwords} if capwords else _EMPTY
        self.uu_bigrams = uu_bigrams  # frozenset-like of 2-char strings


_EMPTY: frozenset = frozenset()


def _starts_only(mask: np.ndarray) -> np.ndarray:
    """Start index of every maximal True run in a 1-D bool array."""
    s = mask.copy()
    s[1:] &= ~mask[:-1]
    return np.nonzero(s)[0]


def _split_counts(doc_idx: np.ndarray, n_docs: int) -> np.ndarray:
    """Length-(n_docs+1) CUTS array for a sorted doc-index array: doc i's
    rows live at [cuts[i], cuts[i+1]) — callers index the cuts, they do
    not receive (lo, hi) pairs."""
    cuts = np.searchsorted(doc_idx, np.arange(n_docs + 1), side="left")
    return cuts


def batch_scan(texts: Sequence[str]) -> Optional[List[Optional[ScanBundle]]]:
    """Candidate bundles for a batch of documents, or None when the batch
    cannot be utf-32 encoded (lone surrogates — impossible via Arrow/parquet;
    callers fall back to the per-document regex scans). ``None`` entries in
    the returned list mark empty documents (nothing to scan)."""
    n = len(texts)
    if n == 0:
        return []
    # "\n" belongs to no scanned class and is a non-word char, so it breaks
    # runs AND supplies the same \b context a document edge has; the trailing
    # separator terminates every run so no end-of-buffer cases exist.
    try:
        joined = "\n".join(texts) + "\n"
        cp = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
    except UnicodeEncodeError:
        return None
    lens = np.fromiter(map(len, texts), dtype=np.int64, count=n)
    doc_starts = np.zeros(n, dtype=np.int64)
    np.cumsum(lens[:-1] + 1, out=doc_starts[1:])  # +1 per separator
    bits = _class_lut()[cp]

    # digit-run starts
    d_starts = _starts_only(bits & _B_DIGIT != 0)
    d_doc = np.searchsorted(doc_starts, d_starts, side="right") - 1
    d_local = (d_starts - doc_starts[d_doc]).tolist()
    d_cuts = _split_counts(d_doc, n)

    # capwords: upper char immediately followed by a lower char; the token
    # extends through the maximal lower run (CAPWORD_RE's matches exactly —
    # a later capword can't overlap an earlier one's [a-z]+ tail).
    upper = (bits & _B_UPPER) != 0
    lower = (bits & _B_LOWER) != 0
    cw = upper.copy()
    cw[:-1] &= lower[1:]
    cw[-1] = False
    cw_starts = np.nonzero(cw)[0]
    if len(cw_starts):
        # token end = end of the lower run beginning at start+1, found among
        # the (few) lower-run end positions instead of materializing every
        # non-lower index; the trailing separator guarantees every lower run
        # has an end, so the searchsorted index is always in range
        le_mask = lower.copy()
        le_mask[:-1] &= ~lower[1:]
        lower_run_ends = np.nonzero(le_mask)[0] + 1  # exclusive ends
        cw_ends = lower_run_ends[
            np.searchsorted(lower_run_ends, cw_starts + 2, side="left")
        ]
        cw_doc = np.searchsorted(doc_starts, cw_starts, side="right") - 1
        cw_local = (cw_starts - doc_starts[cw_doc]).tolist()
        cw_g = cw_starts.tolist()
        cw_e = cw_ends.tolist()
        cw_cuts = _split_counts(cw_doc, n)
    else:
        cw_local = cw_g = cw_e = []
        cw_cuts = np.zeros(n + 1, dtype=np.int64)

    # consecutive-uppercase bigram positions (acronym-literal prescreen)
    uu = upper.copy()
    uu[:-1] &= upper[1:]
    uu[-1] = False
    uu_pos = np.nonzero(uu)[0]
    uu_doc = np.searchsorted(doc_starts, uu_pos, side="right") - 1
    uu_g = uu_pos.tolist()
    uu_cuts = _split_counts(uu_doc, n)

    # long upper-alnum runs (candidate starts for \b[A-Z0-9]{6,10}\b):
    # start/end masks align 1:1 per maximal run, so lengths come from a
    # single subtraction over the (small) run arrays
    ua = (bits & _B_UALNUM) != 0
    ua_starts = _starts_only(ua)
    if len(ua_starts):
        ua_end_mask = ua.copy()
        ua_end_mask[:-1] &= ~ua[1:]
        ua_ends = np.nonzero(ua_end_mask)[0] + 1
        long_ua = ua_starts[(ua_ends - ua_starts) >= UPPER_RUN_MIN]
    else:
        long_ua = ua_starts
    ua_doc = np.searchsorted(doc_starts, long_ua, side="right") - 1
    ua_local = (long_ua - doc_starts[ua_doc]).tolist()
    ua_cuts = _split_counts(ua_doc, n)

    out: List[Optional[ScanBundle]] = []
    for i in range(n):
        if not lens[i]:
            out.append(None)
            continue
        lo, hi = cw_cuts[i], cw_cuts[i + 1]
        capwords = [
            (cw_local[k], joined[cw_g[k] : cw_e[k]]) for k in range(lo, hi)
        ]
        ulo, uhi = uu_cuts[i], uu_cuts[i + 1]
        uu_bi = (
            {joined[uu_g[k] : uu_g[k] + 2] for k in range(ulo, uhi)}
            if uhi > ulo
            else _EMPTY
        )
        out.append(
            ScanBundle(
                d_local[d_cuts[i] : d_cuts[i + 1]],
                capwords,
                ua_local[ua_cuts[i] : ua_cuts[i + 1]],
                uu_bi,
            )
        )
    return out
