"""Deterministic language identification (fastText-style, dependency-free).

The north rule calls for fastText language-ID run inside vectorized UDFs; the
fastText wheel is unavailable here, so this module defines a deterministic
char/stopword evidence scorer with the same interface — it IS the pinned spec
(fixtures freeze its outputs). Scoring:

- CJK character fraction > ``CJK_THRESHOLD`` -> ``zh`` with conf = that
  fraction (capped at 1.0);
- otherwise per language L in (de, en, es, fr):
  ``score_L = 2 * stopword_hits_L + charset_hits_L`` where stopword hits are
  word-bounded case-insensitive matches of ``langprofiles.STOPWORDS[L]`` and
  charset hits are occurrences of ``langprofiles.CHARSETS[L]`` characters;
- prediction = argmax (ties broken in (de, en, es, fr) order), confidence =
  ``top / (s_de + s_en + s_es + s_fr)``; all-zero evidence -> ("und", 0.0).

The exact same counts/arithmetic are computed vectorized (pandas ``str.count``)
in ``..functions.udfs.langid_batch`` — both paths share ``score_from_counts``
so Spark output equals this oracle bit-for-bit.
"""

from __future__ import annotations

import re
from typing import Dict, List, Tuple

from .langprofiles import CHARSETS, STOPWORDS

CJK_THRESHOLD = 0.30
_SCORED_LANGS = ("de", "en", "es", "fr")  # fixed evidence/tie-break order

CJK_PATTERN = r"[一-鿿]"
STOPWORD_PATTERNS: Dict[str, str] = {
    lang: r"\b(?:" + "|".join(STOPWORDS[lang]) + r")\b" for lang in _SCORED_LANGS
}
CHARSET_PATTERNS: Dict[str, str] = {
    lang: ("[" + re.escape(CHARSETS[lang]) + "]") if CHARSETS[lang] else ""
    for lang in _SCORED_LANGS
}

_cjk_re = re.compile(CJK_PATTERN)
_nonspace_re = re.compile(r"\S")
_stop_res = {lang: re.compile(p, re.IGNORECASE) for lang, p in STOPWORD_PATTERNS.items()}
_charset_res = {lang: re.compile(p) for lang, p in CHARSET_PATTERNS.items() if p}


def score_from_counts(
    cjk: int, nonspace: int, counts: Dict[str, Tuple[int, int]]
) -> Tuple[str, float]:
    """Shared decision function: counts -> (lang, confidence).

    ``counts[lang] = (stopword_hits, charset_hits)``. Must stay arithmetic-
    identical between the oracle and the vectorized UDF.
    """
    if nonspace > 0 and cjk / nonspace > CJK_THRESHOLD:
        return "zh", min(1.0, cjk / nonspace)
    scores: List[float] = []
    for lang in _SCORED_LANGS:
        sw, ch = counts[lang]
        scores.append(2.0 * sw + 1.0 * ch)
    total = scores[0] + scores[1] + scores[2] + scores[3]
    if total <= 0.0:
        return "und", 0.0
    best_i = 0
    for i in range(1, 4):
        if scores[i] > scores[best_i]:
            best_i = i
    return _SCORED_LANGS[best_i], scores[best_i] / total


def detect_language(text: str) -> Tuple[str, float]:
    """Oracle path: one text -> (lang, confidence)."""
    if not text:
        return "und", 0.0
    cjk = len(_cjk_re.findall(text))
    nonspace = len(_nonspace_re.findall(text))
    counts = {}
    for lang in _SCORED_LANGS:
        sw = len(_stop_res[lang].findall(text))
        ch = len(_charset_res[lang].findall(text)) if lang in _charset_res else 0
        counts[lang] = (sw, ch)
    return score_from_counts(cjk, nonspace, counts)
