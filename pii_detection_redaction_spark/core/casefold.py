"""Cross-engine simple lowercasing — the İ (U+0130) rule.

U+0130 LATIN CAPITAL LETTER I WITH DOT ABOVE is the ONLY Unicode codepoint
whose lowercase mapping changes string length (verified by exhaustive scan
over all codepoints): Python ``str.lower()`` and Java/Spark
``lower()`` expand it to ``'i' + U+0307`` (combining dot above), while
DuckDB (utf8proc's one-char mapping) lowers it to plain ``'i'``. Because
U+0307 is not a word character, the expansion silently changes token
boundaries and token bytes in any lowercase-then-tokenize spec, so the
three engines disagree on any text containing İ (e.g. DuckDB counts
``'dİe'`` as the German stopword ``die``; Python/JVM do not).

The repo-wide rule: every spec path that lowercases free text pre-translates
İ→i and THEN lowers, pinning all engines to the one-char mapping:

- Python: :func:`simple_lower` (this module);
- Spark JVM: ``F.lower(F.translate(col, casefold.I_DOT, "i"))`` — see
  ``operators.web.host_from_url``, ``operators.decontam``;
- DuckDB: plain ``lower()`` (already the one-char mapping — no change).

No other codepoint needs translation: for every length-preserving mapping,
Python's ``str.lower``, Java's ``String.toLowerCase`` (locale-free) and
utf8proc agree on the repertoire our specs tokenize (letters stay letters,
fold-only characters like ı/ſ are left alone by ``lower`` in all three).
Pinned cross-engine by ``tests/test_core_quality_langid.py::
test_stopword_token_spec_cross_engine`` and the İ cases added there.
"""

from __future__ import annotations

I_DOT = "İ"  # İ


def simple_lower(text: str) -> str:
    """One-char simple lowercase: ``lower()`` with İ pinned to plain ``i``.

    Equals DuckDB's ``lower()`` on the full input domain; equals plain
    ``str.lower()`` on any text without U+0130.
    """
    if I_DOT in text:
        text = text.replace(I_DOT, "i")
    return text.lower()


__all__ = ["I_DOT", "simple_lower"]
