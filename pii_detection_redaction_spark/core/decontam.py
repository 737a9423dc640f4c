"""Test-set decontamination spec — single source for Spark and DuckDB.

Before training on a web corpus you must drop documents that overlap the
evaluation benchmarks, or downstream eval numbers are fiction. The standard
mechanism (GPT-3 appendix C, Lee et al. 2022): tokenize, form word n-grams,
flag any training document sharing at least one n-gram with the eval set.

Spec constants shared by the Spark operator (``operators.decontam``), the
DuckDB oracle (``plans.oracles``), and tests:

- tokenization: lowercase, split on non-alphanumeric runs, drop empties —
  ASCII classes only so Java regex / RE2 / Python ``re`` agree byte-for-byte;
- NGRAM_N-word shingles joined by single spaces;
- the eval slice is carved DETERMINISTICALLY from the corpus itself for the
  catalog query (salted-hash ticket, ``core.sampling`` arithmetic) — in
  production the eval set is an external benchmark table and the same
  operator takes it as a DataFrame.
"""

from __future__ import annotations

from .sampling import HEX_DIGITS, hex_threshold

NGRAM_N = 8
TOKEN_SPLIT_RE = r"[^a-z0-9]+"
EVAL_SALT = "eval:"
EVAL_RATE = 0.10
EVAL_THRESHOLD = hex_threshold(EVAL_RATE)

__all__ = [
    "NGRAM_N",
    "TOKEN_SPLIT_RE",
    "EVAL_SALT",
    "EVAL_RATE",
    "EVAL_THRESHOLD",
    "HEX_DIGITS",
]
