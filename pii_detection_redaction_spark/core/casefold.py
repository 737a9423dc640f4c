"""Cross-engine simple lowercasing — pinning the three engines' lower().

The three engines carry three different Unicode versions (CPython ~14,
this JVM ~16, DuckDB's utf8proc older), so ``lower()`` itself diverges.
Exhaustive scan over every codepoint (re-derived by
``tests/test_casefold.py::test_simple_lower_equals_duckdb_on_full_domain``)
finds exactly 71 divergent codepoints, in two classes:

- **U+0130 İ** — the only codepoint whose lowercase mapping changes string
  LENGTH anywhere: Python and Java expand it to ``'i' + U+0307`` (full
  special casing) while DuckDB maps it to plain ``'i'``. Because U+0307
  is a mark, the expansion changes token boundaries and token bytes in
  any lowercase-then-tokenize spec (DuckDB counts ``'dİe'`` as the German
  stopword ``die``; unpinned Python/JVM would not).
- **70 late-Unicode capitals** (Ᲊ U+1C89, Ⱟ U+2C2F, Ꟁ/Ꟈ/Ꟊ/Ɤ/Ꟍ/Ꟑ/Ꟗ/Ꟙ/Ꟛ/Ƛ/Ꟶ
  in A7xx, Vithkuqi U+10570-10595, Garay U+10D50-10D65) that newer Unicode
  tables lowercase but DuckDB's leaves UNCHANGED (identity both ways).

The repo-wide spec pins every engine to DuckDB's ONE-CHAR mapping: İ→i,
and the 70 late capitals left unchanged. One-char lowering is the property
that makes lower() COMMUTE with tokenization (no introduced marks, no
case-pair boundary flips), which is why the pin goes toward DuckDB rather
than the newer tables:

- Python: :func:`simple_lower` (İ pre-translate + piecewise lower that
  skips the pinned capitals; the common no-exotic-chars path is one
  C-level scan + ``str.lower``);
- Spark JVM: ``functions.casefold.simple_lower_col`` (translate İ→i, and a
  split/keep/rejoin over the pinned class only when one is present);
- DuckDB: plain ``lower()`` — it IS the one-char mapping.

DECLARED residual seam (out of the lowering spec): regex word-CLASS
membership also skews across Unicode tables — measured 4,388 codepoints
(all astral/exotic scripts: Kawi, Nag Mundari, ...) where Python ``\\w``
and RE2 ``[\\p{L}\\p{N}_]`` disagree, so ``\\w+``-tokenizer boundaries can
differ around those characters regardless of lowering. No stopword, PII
pattern, or quality rule in this repo matches any of those scripts, so a
membership hit can only diverge when such a character directly abuts an
exact stopword spelling; pinning it would mean embedding a full Unicode
class table in SQL. ``\\S+`` tokenizers (hashing, exsub) are immune —
whitespace tables are stable across all three engines.
"""

from __future__ import annotations

import re

I_DOT = "İ"  # U+0130

# The 70 identity-pinned capitals (DuckDB lower() leaves them unchanged;
# newer Unicode tables lowercase them). Re-derived exhaustively by the
# cross-engine test — a DuckDB/CPython upgrade in this environment that
# shifts the set fails that test loudly.
_PINNED_RANGES = (
    (0x1C89, 0x1C89),  # Ᲊ (Unicode 16)
    (0x2C2F, 0x2C2F),  # Ⱟ (Unicode 14)
    (0xA7C0, 0xA7C0), (0xA7C7, 0xA7C7), (0xA7C9, 0xA7C9),
    (0xA7CB, 0xA7CC),  # Ɤ/Ꟍ (Unicode 16)
    (0xA7D0, 0xA7D0), (0xA7D6, 0xA7D6), (0xA7D8, 0xA7D8),
    (0xA7DA, 0xA7DA), (0xA7DC, 0xA7DC),  # Ꟛ/Ƛ (Unicode 16)
    (0xA7F5, 0xA7F5),
    (0x10570, 0x1057A), (0x1057C, 0x1058A),  # Vithkuqi (Unicode 14)
    (0x1058C, 0x10592), (0x10594, 0x10595),
    (0x10D50, 0x10D65),  # Garay (Unicode 16)
)
PINNED = frozenset(
    cp for lo, hi in _PINNED_RANGES for cp in range(lo, hi + 1)
)
PINNED_CLASS = "[" + "".join(
    (chr(lo) if lo == hi else f"{chr(lo)}-{chr(hi)}")
    for lo, hi in _PINNED_RANGES
) + "]"
_PIN_RE = re.compile(PINNED_CLASS)


def simple_lower(text: str) -> str:
    """DuckDB's one-char ``lower()`` on the full input domain: İ→i, the 70
    pinned capitals unchanged, everything else ``str.lower()`` (equal by
    the exhaustive scan). Texts without exotic chars take the fast path:
    one containment check (+ İ replace when present) and one lower()."""
    if I_DOT in text:
        text = text.replace(I_DOT, "i")
    if _PIN_RE.search(text) is None:
        return text.lower()
    parts = _PIN_RE.split(text)
    kept = _PIN_RE.findall(text)
    out = [parts[0].lower()]
    for k, p in zip(kept, parts[1:]):
        out.append(k)
        out.append(p.lower())
    return "".join(out)


# --- cross-engine whitespace (the \x0b rule) -------------------------------
# Probe-verified tables: Java `\s` == Python `re.ASCII` `\s` ==
# [ \t\n\r\f\x0b]; RE2/DuckDB `\s` EXCLUDES \x0b; Python's default
# (Unicode) `\s` additionally matches NBSP/U+2028/U+0085/U+3000/\x1c-\x1f.
# Any "word = maximal \S+ run" spec therefore forks across engines on real
# web text (&nbsp; is everywhere). The pin: the EXPLICIT class below — the
# same raw pattern string parses identically in Python re, Java regex, and
# RE2, so every engine tokenizes on the same six ASCII whitespace chars.
WS_CHARS = " \t\n\r\f\x0b"  # the actual characters (str.strip/rstrip uses)
SPACE_ONE = r"[ \t\n\r\f\x0b]"  # engine-portable `\s`
NONSPACE_ONE = r"[^ \t\n\r\f\x0b]"  # engine-portable `\S`
NONSPACE_RUN = NONSPACE_ONE + "+"  # engine-portable `\S+` (word runs)


# --- cross-engine ASCII case-insensitivity ---------------------------------
def ascii_ci_expand(rx: str) -> str:
    """Rewrite a ``(?i)``-prefixed literal-word alternation to explicit
    two-case classes (``the`` → ``[tT][hH][eE]``), dropping the flag.

    The engines' ``(?i)`` tables disagree (probe-verified): Python re and
    RE2/DuckDB fold Unicode (ſ→s, U+212A Kelvin→k), Java folds ASCII only.
    Java's ASCII fold is the spec; Java therefore keeps the ``(?i)`` form
    (plus its fast first-char-lookahead derivation), while the Python
    oracle and the DuckDB SQL consume THIS expansion — explicit classes
    fold nothing anywhere. ``\\b`` and every other escape pass through
    untouched (escapes are skipped, so the ``b`` of ``\\b`` is never
    expanded); word-boundary semantics keep their own documented
    engine-table note (core.quality)."""
    if not rx.startswith("(?i)"):
        raise ValueError(f"expected a (?i)-prefixed pattern, got {rx[:20]!r}")
    body, out, i = rx[4:], [], 0
    while i < len(body):
        c = body[i]
        if c == "\\":
            out.append(body[i : i + 2])
            i += 2
            continue
        if c.isascii() and c.isalpha():
            out.append(f"[{c.lower()}{c.upper()}]")
        elif c.isalpha():
            raise ValueError(
                f"non-ASCII letter {c!r} in alternation — the ASCII "
                f"expansion would silently change its match semantics"
            )
        else:
            out.append(c)
        i += 1
    return "".join(out)


__all__ = [
    "I_DOT",
    "PINNED",
    "PINNED_CLASS",
    "simple_lower",
    "WS_CHARS",
    "SPACE_ONE",
    "NONSPACE_ONE",
    "NONSPACE_RUN",
    "ascii_ci_expand",
]
