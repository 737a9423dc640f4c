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
from ..functions.casefold import simple_lower_col

# shared Spark (Java) / DuckDB (RE2) / Python re — ASCII classes, no
# lookaround. Scheme per RFC 3986 (any case — 'HTTP://…' is a valid
# spelling of the same host); authority stops at '/', '?', or '#' (a
# query/fragment directly after the authority — 'http://h?x=1' — must not
# leak into the host, or a blocked host evades its blocklist/cap by
# varying query strings). The previous ^[a-z]+://([^/]+) had both holes.
# The spec constants live in core.urlnorm (HOST_REGEX / HOST_USERINFO_RE /
# HOST_PORT_RE — one home, consumed verbatim by the DuckDB oracle);
# re-exported here under the historical name.
HOST_REGEX = UN.HOST_REGEX


def host_col(url_col: str = "url") -> Column:
    """The host KEY (core.urlnorm host spec): authority minus userinfo
    minus any port, one-char-lowered, '' for unparseable/NULL urls. Host
    keys, blocklists, and caps must treat 'Blocked.COM', 'blocked.com:80'
    and 'u@blocked.com' as ONE host or the blocklist/quota is evadable by
    spelling; NULL coalesces to '' so NULL-url rows form one cappable
    group instead of falling through every null-key join probe. Lowering
    goes through the cross-engine spec (functions.casefold): the engines'
    own lower()s disagree on İ and 70 late-Unicode capitals."""
    auth = F.regexp_extract(F.col(url_col), UN.HOST_REGEX, 1)
    auth = F.regexp_replace(auth, UN.HOST_USERINFO_RE, "")
    auth = F.regexp_replace(auth, UN.HOST_PORT_RE, "")
    return F.coalesce(simple_lower_col(auth), F.lit(""))


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
    # lower via the cross-engine one-char spec (matches urlnorm's
    # simple_lower and DuckDB's lower on every codepoint)
    auth = F.regexp_replace(simple_lower_col(auth), UN.DEFAULT_PORT_RE, "")
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
    — identical movement to any keep-one-per-key dedup lower bound.

    NULL-url rows are NOT deduped: a url-keyed identity cannot key NULL,
    and Window.partitionBy groups all NULLs into ONE partition — N
    unrelated partial records would silently collapse to a single survivor.
    They pass through unmodified (canonical_url NULL, n_crawls 1)."""
    keyed = df.filter(F.col(url_col).isNotNull())
    null_rows = (
        df.filter(F.col(url_col).isNull())
        .withColumn("canonical_url", F.lit(None).cast("string"))
        .withColumn("n_crawls", F.lit(1).cast("long"))
    )
    w = Window.partitionBy("canonical_url")
    wo = w.orderBy(F.col(ts_col).desc(), F.col(url_col).desc())
    deduped = (
        keyed.withColumn("canonical_url", canonical_url_col(url_col))
        .withColumn("__rn", F.row_number().over(wo))
        .withColumn("n_crawls", F.count(F.lit(1)).over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    return deduped.unionByName(null_rows)


def cap_per_host(
    df: DataFrame,
    cap: int,
    url_col: str = "url",
    text_col: str = "text",
    host_col_name: str | None = None,
    n_salts: int = 1,
) -> DataFrame:
    """Keep at most ``cap`` pages per host, preferring longer pages
    (order: length(text) DESC, url ASC — total because URLs are unique).

    Host-domination control (the FineWeb/RefinedWeb "url quota" stage): a
    handful of boilerplate-heavy hosts (forums, shops, link farms) otherwise
    contribute millions of near-identical pages to a trained corpus.

    Scale design — the corpus must NOT pay a window shuffle for a per-host
    cap, because almost every host is under the cap:
    1. count pages per host (map-side partials; only (host, count) pairs
       shuffle) and keep the hosts OVER the cap — with a Zipf host
       distribution this set is tiny (the head), so it broadcasts;
    2. rows of under-cap hosts pass through a broadcast LEFT-ANTI probe —
       the page payload never shuffles;
    3. only rows of over-cap hosts (broadcast LEFT-SEMI) enter the
       row_number window — exactly one payload Exchange, over the head
       subset only; Spark further prunes it with a partial
       WindowGroupLimit (map-side top-cap before the shuffle, pinned by
       ``test_cap_per_host_under_cap_rows_avoid_the_window``).
    The input is scanned three times (count + two probes); at 100 TB a scan
    is cheap next to shuffling page payloads, and the count scan prunes to
    the two key columns.

    ``n_salts > 1`` adds an exact pre-pruning phase for pathological hosts
    whose rows exceed one task's memory: top-``cap`` per (host, salt) first
    — top-k of a union is the top-k of per-part top-k's, so this is
    lossless — leaving at most cap*n_salts rows per host for the final
    window. (``test_cap_per_host_salted_equals_plain``.)
    """
    if host_col_name == "host":
        d = df
    else:
        src = F.col(host_col_name) if host_col_name else host_col(url_col)
        d = df.withColumn("host", src)
    over_hosts = (
        d.groupBy("host")
        .count()
        .filter(F.col("count") > cap)
        .select("host")
    )
    under = d.join(F.broadcast(over_hosts), "host", "left_anti")
    over = d.join(F.broadcast(over_hosts), "host", "left_semi")
    order = [F.length(text_col).desc(), F.col(url_col).asc()]
    if n_salts > 1:
        salt = F.pmod(F.xxhash64(F.col(url_col)), F.lit(n_salts))
        over = (
            over.withColumn("__rn1", F.row_number().over(
                Window.partitionBy("host", salt).orderBy(*order)))
            .filter(F.col("__rn1") <= cap)
            .drop("__rn1")
        )
    w = Window.partitionBy("host").orderBy(*order)
    kept_over = (
        over.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= cap)
        .drop("__rn")
    )
    return under.unionByName(kept_over)


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
