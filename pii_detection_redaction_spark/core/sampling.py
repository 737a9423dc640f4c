"""Deterministic hash-sampling spec — single source for Spark and DuckDB.

Rebalancing a web corpus (downsampling over-represented languages, carving
reproducible eval slices) must be a pure function of the row key, never of
``rand()``: re-runs, resumes, and two engines must pick the SAME rows. The
standard trick is a salted-hash threshold: a row is kept iff the first
``HEX_DIGITS`` hex chars of md5(salt || key) fall below the stratum's
threshold. md5's prefix is uniform, both engines produce identical lowercase
hex, and plain string comparison decides membership — no floats, no RNG
state, no engine divergence.

``hex_threshold(rate)`` maps a keep-rate to the threshold string; rate 1.0
maps to 'g', which every hex string sorts below — the keep-everything
sentinel that avoids a 5-digit threshold breaking lexicographic compare.
"""

from __future__ import annotations

SAMPLE_SALT = "sample:"
HEX_DIGITS = 4  # 16^4 = 65536 buckets; rate granularity ~1.5e-5

# catalog-query stratification: downsample the over-represented language
# (web corpora are English-heavy), keep the rest whole
SAMPLE_RATES = {"en": 0.25}
DEFAULT_RATE = 1.0


def hex_threshold(rate: float) -> str:
    """Keep-rate -> lexicographic hex threshold on the md5 prefix."""
    if rate >= 1.0:
        return "g"  # sorts above every hex digit: keep all
    n = max(0, round(rate * 16**HEX_DIGITS))
    if n >= 16**HEX_DIGITS:
        # rate just under 1.0 rounds up to 16^d, whose hex spelling is one
        # char LONGER ('10000') and lexicographically keeps only tickets
        # starting '0' (~6%!) — the round-to-keep-all case must take the
        # sentinel path like rate==1.0 does
        return "g"
    return format(n, f"0{HEX_DIGITS}x")


def keep_row(key: str, rate: float) -> bool:
    """Pure-Python mirror (unit tests)."""
    import hashlib

    h = hashlib.md5((SAMPLE_SALT + key).encode("utf-8")).hexdigest()
    return h[:HEX_DIGITS] < hex_threshold(rate)


# --- token-budget mixture sampling ------------------------------------------
# Mixture construction ("this corpus contributes at most B tokens of lang L")
# derives each stratum's keep-rate FROM THE DATA: rate = budget / total
# tokens. The threshold arithmetic must be engine-exact, so it avoids
# round(): double(budget)/double(total) — each operand rounded to a double
# FIRST, matching the JVM cast chain and DuckDB's CAST(... AS DOUBLE) —
# then *16^HEX_DIGITS (exact, power of two) and floor(), which agree
# everywhere. Strata without a budget are dropped — a mixture
# spec says what goes IN.

BUDGET_SALT = "budget:"

# catalog-query mixture over the documents table (~10-12k en tokens, ~4-5k
# fr/de at the driver's scales): en and fr budgets bind (rates ~0.5 / ~0.2),
# de's budget exceeds any corpus here (keep-all 'g' path), es/zh carry no
# budget (dropped) — all four code paths exercised at sf0.001 AND sf0.01
TOKEN_BUDGETS = {"en": 6_000, "fr": 1_000, "de": 10_000_000}


def budget_threshold(budget: int, total: int) -> str:
    """Hex keep-threshold for a token budget over a stratum's total."""
    import math

    if total <= budget:
        return "g"  # keep-all sentinel (sorts above every hex digit)
    # float() each operand FIRST: the JVM and DuckDB compute
    # double(budget)/double(total) — two roundings. Python's int/int true
    # division is correctly rounded from the exact rational and can differ
    # by 1 ulp once operands exceed 2^53 (real 100-TB token totals), which
    # would flip floor() across engines at threshold-straddling values.
    n = math.floor((float(budget) / float(total)) * 16**HEX_DIGITS)
    if n >= 16**HEX_DIGITS:
        # float(budget)/float(total) can round to exactly 1.0 when the two
        # huge totals are within 1 ulp — same 5-char-hex trap as above
        return "g"
    return format(n, f"0{HEX_DIGITS}x")


def keep_row_budget(key: str, budget: int, total: int) -> bool:
    """Pure-Python mirror (unit tests)."""
    import hashlib

    h = hashlib.md5((BUDGET_SALT + key).encode("utf-8")).hexdigest()
    return h[:HEX_DIGITS] < budget_threshold(budget, total)
