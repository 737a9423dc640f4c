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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..core import urlnorm as UN

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


def canonical_url_col(url_col: str = "url") -> Column:
    """Canonical URL as a pure JVM expression chain (core.urlnorm spec,
    step-for-step): strip fragment, drop tracking params, collapse separator
    debris, lowercase the authority (stripping :80/:443), strip trailing
    slashes. Seven regexp_replace/extract nodes — stays inside whole-stage
    codegen, so it is free to compute at scan time and usable as a shuffle
    key without materializing anything."""
    u = F.col(url_col)
    u = F.regexp_replace(u, UN.FRAGMENT_RE, "")
    u = F.regexp_replace(u, UN.TRACKING_RE, UN.TRACKING_REPL_JAVA)
    u = F.regexp_replace(u, UN.QMARK_AMP_RE, "?")
    u = F.regexp_replace(u, UN.MULTI_AMP_RE, "&")
    u = F.regexp_replace(u, UN.TRAILING_SEP_RE, "")
    auth = F.regexp_extract(u, f"({UN.AUTHORITY_RE})", 1)
    rest = F.regexp_replace(u, UN.AUTHORITY_RE, "")
    auth = F.regexp_replace(F.lower(auth), UN.DEFAULT_PORT_RE, "")
    return F.regexp_replace(F.concat(auth, rest), UN.TRAILING_SLASH_RE, "")


def dedup_latest_crawl(
    df: DataFrame, url_col: str = "url", ts_col: str = "warc_ts"
) -> DataFrame:
    """URL-level crawl dedup: canonicalize, keep the LATEST crawl record per
    canonical URL (ties broken on raw url desc — deterministic), and report
    how many crawl records collapsed into it (``n_crawls``).

    Scale: exactly one shuffle, on canonical_url; row_number and count ride
    the SAME window partitioning so Spark computes both in one Window node
    over one Exchange. Canonical URLs are near-unique (a page has a handful
    of crawl records, never millions), so the key cannot skew and the window
    buffer per key is tiny. The full row (html payload included) moves once
    — identical movement to any keep-one-per-key dedup lower bound."""
    w = Window.partitionBy("canonical_url")
    wo = w.orderBy(F.col(ts_col).desc(), F.col(url_col).desc())
    return (
        df.withColumn("canonical_url", canonical_url_col(url_col))
        .withColumn("__rn", F.row_number().over(wo))
        .withColumn("n_crawls", F.count(F.lit(1)).over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


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
