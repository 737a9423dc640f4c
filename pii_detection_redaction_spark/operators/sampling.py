"""Deterministic stratified sampling as scan-side JVM expressions.

Spec in ``core.sampling`` (salt, hex-threshold arithmetic) — consumed
identically by this module (Spark), ``plans.oracles`` (DuckDB SQL), and the
pure-Python mirror. No reference counterpart (the reference processes every
input file); this is a north-rule pipeline need: at 10^12 documents every
corpus-shaping decision must be reproducible across re-runs and resumes,
which rules out ``rand()``/``DataFrame.sample`` (partition-layout dependent).

Scale: the predicate is md5 + substring + CASE — whole-stage codegen, zero
shuffle, evaluated at the scan, so a 25% sample reads 100% of rows but
materializes (and pays downstream cost for) only the kept quarter. The
stratum thresholds fold to a literal CASE; no join, no broadcast needed.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..core import sampling as S


def sample_hash_col(key_col: Column, salt: str = S.SAMPLE_SALT) -> Column:
    """First HEX_DIGITS hex chars of md5(salt || key) — THE salted-hash
    ticket expression (one Spark spelling for every consumer: stratified
    and budget sampling here, the decontamination eval slice)."""
    return F.substring(
        F.md5(F.concat(F.lit(salt), key_col.cast("string"))),
        1,
        S.HEX_DIGITS,
    )


def keep_col(
    key_col: Column,
    strata_col: Column,
    rates: Mapping[str, float] = S.SAMPLE_RATES,
    default_rate: float = S.DEFAULT_RATE,
) -> Column:
    """Boolean keep predicate: ticket < per-stratum hex threshold."""
    thresh = F.lit(S.hex_threshold(default_rate))
    expr = None
    for stratum, rate in sorted(rates.items()):
        cond = strata_col == stratum
        t = F.lit(S.hex_threshold(rate))
        expr = F.when(cond, t) if expr is None else expr.when(cond, t)
    thresh = thresh if expr is None else expr.otherwise(thresh)
    return sample_hash_col(key_col) < thresh


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: Mapping[str, float] = S.SAMPLE_RATES,
    default_rate: float = S.DEFAULT_RATE,
) -> DataFrame:
    """Keep each row iff its salted-hash ticket clears its stratum's rate."""
    return df.filter(keep_col(F.col(key_col), F.col(strata_col), rates, default_rate))


# --- token-budget mixture sampling ------------------------------------------


def budget_ticket_col(key_col: Column) -> Column:
    """Budget-salted sampling ticket (distinct salt: a row's fate under the
    mixture sampler is independent of its fate under ``stratified_sample``)."""
    return sample_hash_col(key_col, salt=S.BUDGET_SALT)


def token_budget_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    tokens_col: str,
    budgets: Mapping[str, int] = S.TOKEN_BUDGETS,
) -> DataFrame:
    """Mixture construction: keep each stratum's rows at rate
    budget/total_tokens (keep-all when the stratum fits its budget; strata
    WITHOUT a budget are dropped — a mixture spec says what goes in).

    Hash-threshold sampling hits the budget in expectation (each kept row is
    a budget/total Bernoulli on a deterministic ticket); the realized token
    count concentrates within O(sqrt(total)) of the budget.

    Driver-literal variant: one token-count aggregation (map-side partials;
    only (stratum, sum) pairs shuffle, one row per language collected — the
    driver result is bounded by the number of strata, not the data), then
    the thresholds fold into a literal CASE evaluated at the scan: the
    sample itself is zero-shuffle whole-stage codegen, like
    ``stratified_sample``. Use ``token_budget_sample_join`` when strata are
    unbounded (e.g. per-host budgets)."""
    totals = {
        r[0]: r[1]
        for r in df.groupBy(strata_col).agg(F.sum(tokens_col)).collect()
        if r[1] is not None
    }
    thresholds = {
        s: S.budget_threshold(b, totals[s]) for s, b in budgets.items() if s in totals
    }
    drop = F.lit("0" * S.HEX_DIGITS)  # no ticket sorts below all-zeros
    expr = None
    for stratum, t in sorted(thresholds.items()):
        cond = F.col(strata_col) == stratum
        expr = F.when(cond, F.lit(t)) if expr is None else expr.when(cond, F.lit(t))
    thresh = drop if expr is None else expr.otherwise(drop)
    return df.filter(budget_ticket_col(F.col(key_col)) < thresh)


def token_budget_sample_join(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    tokens_col: str,
    budgets: Mapping[str, int] = S.TOKEN_BUDGETS,
) -> DataFrame:
    """Broadcast-join variant of ``token_budget_sample`` — no driver collect,
    for unbounded strata: thresholds are derived as columns on the (tiny)
    per-stratum totals and broadcast; the inner join drops unbudgeted
    strata. The threshold arithmetic (double(b)/double(t), exact *16^d,
    floor) is replicated JVM-side so both variants and the DuckDB oracle
    agree bit-for-bit (``test_budget_sample_variants_agree``)."""
    spark = df.sparkSession
    bdf = spark.createDataFrame(
        [(s, int(b)) for s, b in sorted(budgets.items())],
        [strata_col, "__budget"],
    )
    scale = 16**S.HEX_DIGITS
    totals = df.groupBy(strata_col).agg(F.sum(tokens_col).alias("__total"))
    th = (
        totals.join(bdf, strata_col)
        .select(
            strata_col,
            F.when(F.col("__total") <= F.col("__budget"), F.lit("g"))
            .when(
                # b/t can round to exactly 1.0 one ulp early: floor hits
                # 16^d whose hex spelling is one char longer — must take
                # the keep-all sentinel (mirrors core.budget_threshold)
                F.floor(
                    (
                        F.col("__budget").cast("double")
                        / F.col("__total").cast("double")
                    )
                    * scale
                )
                >= scale,
                F.lit("g"),
            )
            .otherwise(
                F.format_string(
                    f"%0{S.HEX_DIGITS}x",
                    F.floor(
                        (
                            F.col("__budget").cast("double")
                            / F.col("__total").cast("double")
                        )
                        * scale
                    ).cast("int"),
                )
            )
            .alias("__thresh"),
        )
    )
    return (
        df.join(F.broadcast(th), strata_col)
        .filter(budget_ticket_col(F.col(key_col)) < F.col("__thresh"))
        .drop("__thresh")
    )
