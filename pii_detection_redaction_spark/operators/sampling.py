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


def sample_hash_col(key_col: Column) -> Column:
    """First HEX_DIGITS hex chars of md5(salt || key) — the sampling ticket."""
    return F.substring(
        F.md5(F.concat(F.lit(S.SAMPLE_SALT), key_col.cast("string"))),
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
