"""Host-level web-corpus operators: host extraction, blocklist filtering,
per-host rollups.

A Common-Crawl-scale pipeline groups and gates by registered host constantly
(crawl politeness stats, spam/adult blocklists a la UT1, per-host quality
priors). The reference operates on files/cells and has no URL notion; these
are north-rule additions (web-page input schema, BASELINE.json input_hint).

Scale design:
- host extraction is a single JVM ``regexp_extract`` — stays inside
  whole-stage codegen, usable as a partitioning / bucketing key
  (``plans.pipeline`` buckets by url hash; host-hash is the coarser unit).
- blocklist filtering: real blocklists are tables of up to ~5M hosts — far
  too big for an ``isin`` literal but tiny next to the corpus, so the
  operator broadcast LEFT-ANTI joins (hash probe per row, no shuffle of the
  corpus). For literal lists under a few hundred entries
  ``~host.isin(...)`` folds into the scan predicate instead.
- per-host rollups shuffle only (host, metric) pairs after map-side partial
  aggregation; heavy-hitter hosts (every crawl has a Zipf head) collapse to
  one partial row per map task, so the shuffle itself cannot skew — unlike
  joins, aggregations need no salting when partials are enabled (they are,
  by default).
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# shared Spark (Java) / DuckDB (RE2) / Python re — ASCII classes, no
# lookaround: scheme://authority, authority = everything up to the first '/'
HOST_REGEX = r"^[a-z]+://([^/]+)"


def host_col(url_col: str = "url") -> Column:
    """Authority component of the URL ('' when the URL has no scheme)."""
    return F.regexp_extract(F.col(url_col), HOST_REGEX, 1)


def filter_blocked_hosts(
    df: DataFrame, blocked: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Drop rows whose URL host appears in ``blocked`` (a 1-column ``host``
    DataFrame). Broadcast left-anti join: the corpus never shuffles."""
    return df.withColumn("host", host_col(url_col)).join(
        F.broadcast(blocked), "host", "left_anti"
    )


def filter_blocked_hosts_literal(
    df: DataFrame, blocked: Iterable[str], url_col: str = "url"
) -> DataFrame:
    """Literal-list variant: folds to a scan predicate (no join at all).
    Only for small lists — a real UT1-scale blocklist is a table."""
    return df.filter(~host_col(url_col).isin(list(blocked)))


def host_rollup(
    df: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    host_col_name: str | None = None,
) -> DataFrame:
    """(host, n_pages, total_chars, avg_chars): per-host page/byte stats.
    avg is derived from the two sums AFTER aggregation (same association
    order as the SQL oracle) and rounded to 2dp. Pass ``host_col_name`` to
    aggregate an already-extracted host column (e.g. the one
    ``filter_blocked_hosts`` added) instead of re-running the regexp."""
    host = (
        F.col(host_col_name) if host_col_name else host_col(url_col)
    )
    return (
        df.select(host.alias("host"), F.length(text_col).alias("n"))
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.sum("n").alias("total_chars"),
        )
        .select(
            "host",
            "n_pages",
            "total_chars",
            F.round(
                F.col("total_chars").cast("double") / F.col("n_pages"), 2
            ).alias("avg_chars"),
        )
    )
