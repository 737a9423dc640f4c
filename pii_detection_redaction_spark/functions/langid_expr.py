"""Language-ID as JVM column expressions (no Python in the hot path).

The langid evidence model (stopword hits x2 + charset hits x1, CJK fraction
override, first-max tie-break — ``core.langid``) is entirely counting +
arithmetic, so it compiles to ``regexp_count`` columns inside whole-stage
codegen — the same structure as the DuckDB oracle SQL
(``plans.oracles._langid_sql``). Output is bit-identical to the Python
``detect_language`` oracle: integer counts are exact, and the confidence
divisions execute the same IEEE-754 ops in the same order.

Measured result (why the pipeline does NOT use this): at 16 cores / 100k
docs, these JVM columns cost 17-19s while the fused pandas langid+ppl UDF
costs 7.3s *including perplexity* — Java regex case-insensitive
alternations are ~3-5x slower than pandas' C ``str.count`` loop, and Arrow
transfer is not the bottleneck at this row width. Kept because (a) it
documents the SQL-expressible structure the DuckDB oracle checks, and
(b) on a cluster where Python worker slots — not JVM cores — are the
constrained resource, the trade can flip; it is pinned bit-identical to
``core.langid.detect_language`` by ``test_langid_expr_bit_identical``.
"""

from __future__ import annotations

from typing import Tuple

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..core import langid as LID


def langid_columns(text_col: Column) -> Tuple[Column, Column]:
    """(lang_pred, lang_conf) columns; null text scores like ''.

    Generated from the same language tables the oracle uses
    (``_SCORED_LANGS``, ``SCRIPT_OVERRIDES``), so widening the language set
    widens this expression automatically."""
    text = F.coalesce(text_col, F.lit(""))
    # (?U) = Java UNICODE_CHARACTER_CLASS: without it Java's \S counts
    # 　 (ideographic space, ubiquitous in CJK) and \xa0 (nbsp,
    # ubiquitous in HTML text) as NON-space while Python's \S does not —
    # measured to flip zh detection on mixed text. Likewise (?iu) below:
    # bare (?i) in Java folds ASCII only, so 'ESTÁ' would not match 'está'.
    nonspace = F.regexp_count(text, F.lit(r"(?U)\S"))
    s = {}
    for lang in LID._SCORED_LANGS:
        sw = F.regexp_count(text, F.lit("(?iu)" + LID.STOPWORD_PATTERNS[lang]))
        pat = LID.CHARSET_PATTERNS[lang]
        ch = F.regexp_count(text, F.lit(pat)) if pat else F.lit(0)
        s[lang] = 2.0 * sw + 1.0 * ch
    langs = list(LID._SCORED_LANGS)
    total = s[langs[0]]
    for lang in langs[1:]:
        total = total + s[lang]

    # script overrides (ja > ko > zh), then und, then first-max tie-break in
    # the fixed evidence order (== np.argmax)
    lang_when = None
    conf_when = None

    def _chain(w, cond, val):
        return F.when(cond, val) if w is None else w.when(cond, val)

    for lg, pat, threshold in LID.SCRIPT_OVERRIDES:
        frac = F.regexp_count(text, F.lit(pat)).cast("double") / nonspace
        cond = (nonspace > 0) & (frac > threshold)
        lang_when = _chain(lang_when, cond, F.lit(lg))
        conf_when = _chain(conf_when, cond, F.least(F.lit(1.0), frac))
    lang_when = lang_when.when(total <= 0.0, F.lit("und"))
    conf_when = conf_when.when(total <= 0.0, F.lit(0.0))
    for i, lg in enumerate(langs[:-1]):
        cond = None
        for other in langs[i + 1 :]:
            c = s[lg] >= s[other]
            cond = c if cond is None else (cond & c)
        lang_when = lang_when.when(cond, F.lit(lg))
        conf_when = conf_when.when(cond, s[lg] / total)
    lang = lang_when.otherwise(F.lit(langs[-1]))
    conf = conf_when.otherwise(s[langs[-1]] / total)
    return lang, conf
