"""Host-level web operators: extraction semantics, blocklist strategy
equivalence, rollup arithmetic, plan shape."""

import pandas as pd

from pyspark.sql import functions as F

from pii_detection_redaction_spark.operators import web as W

ROWS = [
    ("https://a.example.com/x", "aaaa"),
    ("https://a.example.com/y", "bbbbbb"),
    ("http://b.example.org/", "cc"),
    ("ftp://c.example.io", "d"),  # no trailing slash: host = full authority
    ("no-scheme/path", "ee"),  # unparseable -> host ''
]


def test_host_extraction(spark):
    df = spark.createDataFrame(ROWS, ["url", "text"])
    got = [r.h for r in df.select(W.host_col().alias("h")).collect()]
    assert got == ["a.example.com", "a.example.com", "b.example.org", "c.example.io", ""]


def test_blocklist_strategies_agree(spark):
    df = spark.createDataFrame(ROWS, ["url", "text"])
    blocked = ["a.example.com", "absent.example.com"]
    via_join = W.filter_blocked_hosts(
        df, spark.createDataFrame([(h,) for h in blocked], ["host"])
    )
    via_literal = W.filter_blocked_hosts_literal(df, blocked)
    assert sorted(r.url for r in via_join.collect()) == sorted(
        r.url for r in via_literal.collect()
    ) == ["ftp://c.example.io", "http://b.example.org/", "no-scheme/path"]
    plan = via_join._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan  # corpus side never shuffles


def test_host_rollup_arithmetic(spark):
    df = spark.createDataFrame(ROWS, ["url", "text"])
    got = W.host_rollup(df).orderBy("host").toPandas()
    exp = pd.DataFrame(
        {
            "host": ["", "a.example.com", "b.example.org", "c.example.io"],
            "n_pages": [1, 2, 1, 1],
            "total_chars": [2, 10, 2, 1],
            "avg_chars": [2.0, 5.0, 2.0, 1.0],
        }
    )
    pd.testing.assert_frame_equal(got.reset_index(drop=True), exp, check_dtype=False)


def test_rollup_partial_aggregation(spark):
    """The host agg must have map-side partials (partial_count/partial_sum
    before the Exchange) — the property that makes Zipf-head hosts safe
    without salting."""
    df = spark.createDataFrame(ROWS, ["url", "text"])
    plan = W.host_rollup(df)._jdf.queryExecution().executedPlan().toString()
    assert "partial_count" in plan and "partial_sum" in plan


# --- URL canonicalization + crawl dedup ------------------------------------

MESSY = [
    "https://Site01.Example.ORG:443/page-3?utm_source=feed&utm_campaign=rss#frag",
    "https://site01.example.org/page-3/?ref=rss",
    "http://host.example.com:80/a/b/",
    "https://h.example/x?id=7&utm_medium=x&page=2",
    "https://h.example/x?gclid=abc123&fbclid=xyz&utm_medium=email",
    "https://h.example/",
    "no-scheme-plain-text",
]


def test_canonical_url_spark_matches_python_mirror(spark):
    """The JVM expression chain and the pure-Python re mirror are the same
    spec (core.urlnorm) — byte-identical output on every rule's edge case."""
    from pii_detection_redaction_spark.core.urlnorm import canonicalize_url

    df = spark.createDataFrame([(u,) for u in MESSY], ["url"])
    got = [r.c for r in df.select(W.canonical_url_col().alias("c")).collect()]
    assert got == [canonicalize_url(u) for u in MESSY]


def test_canonical_url_rules():
    from pii_detection_redaction_spark.core.urlnorm import canonicalize_url as C

    # each canonicalization rule, pinned
    assert C("https://A.B/x#frag") == "https://a.b/x"          # fragment, host case
    assert C("https://a.b/x?utm_source=f") == "https://a.b/x"  # tracking-only query
    assert C("https://a.b:443/x") == "https://a.b/x"           # default port
    assert C("https://a.b:8443/x") == "https://a.b:8443/x"     # non-default port kept
    assert C("https://a.b/x/") == "https://a.b/x"              # trailing slash
    assert C("https://a.b/x?id=1&ref=r&p=2") == "https://a.b/x?id=1&p=2"  # real params kept
    assert C("https://a.b/x?xref=1") == "https://a.b/x?xref=1"  # 'ref' needs a separator


def test_dedup_latest_crawl(spark):
    rows = [
        ("https://a.b/x?utm_source=f", "2025-01-02 00:00:00"),  # later crawl wins
        ("https://a.b/x", "2025-01-01 00:00:00"),
        ("https://c.d/y", "2025-01-01 00:00:00"),               # singleton
    ]
    df = spark.createDataFrame(rows, ["url", "warc_ts"]).withColumn(
        "warc_ts", F.to_timestamp("warc_ts")
    )
    out = {r.canonical_url: r for r in W.dedup_latest_crawl(df).collect()}
    assert out["https://a.b/x"].url == "https://a.b/x?utm_source=f"
    assert out["https://a.b/x"].n_crawls == 2
    assert out["https://c.d/y"].n_crawls == 1


def test_url_dedup_plan_single_exchange(spark):
    """The crawl dedup is exactly one hash shuffle: row_number and count
    share the window partitioning, and canonicalization is scan-side JVM."""
    from pii_detection_redaction_spark.testing.corpus import ensure_crawl_parquet

    df = spark.read.parquet(ensure_crawl_parquet()).select("url", "warc_ts")
    plan = W.dedup_latest_crawl(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    # rn (ordered frame) and n_crawls (whole-partition frame) render as two
    # Window nodes but share the one Exchange and the one Sort — no re-shuffle
    assert plan.count("Sort") == 1
    # column pruning: html/text payload columns never read
    assert "html" not in plan and "text" not in plan


# --- per-host quota (cap_per_host) ------------------------------------------

QUOTA_ROWS = [
    # host A: 4 pages (over cap=2) — keep the two longest, url tiebreak asc
    ("https://a.ex/p1", "xxxxxx"),
    ("https://a.ex/p2", "xxxx"),
    ("https://a.ex/p3", "xxxx"),
    ("https://a.ex/p4", "x"),
    # host B: 2 pages (exactly at cap) — both kept, via the no-shuffle path
    ("https://b.ex/p1", "yy"),
    ("https://b.ex/p2", "y"),
]


def test_cap_per_host_semantics(spark):
    df = spark.createDataFrame(QUOTA_ROWS, ["url", "text"])
    kept = sorted(r.url for r in W.cap_per_host(df, 2).collect())
    # a.ex: p1 (len 6) then p2 beats p3 on url asc at len 4; p4 dropped
    assert kept == [
        "https://a.ex/p1",
        "https://a.ex/p2",
        "https://b.ex/p1",
        "https://b.ex/p2",
    ]


def test_cap_per_host_salted_equals_plain(spark):
    """Exact top-cap decomposability: per-(host,salt) pre-prune then final
    window == plain window. This is the pathological-host escape hatch."""
    from pii_detection_redaction_spark.testing.corpus import ensure_pages_parquet

    df = spark.read.parquet(ensure_pages_parquet()).select("url", "text")
    plain = sorted(r.url for r in W.cap_per_host(df, 10).collect())
    salted = sorted(r.url for r in W.cap_per_host(df, 10, n_salts=4).collect())
    assert plain == salted and len(plain) > 0


def test_cap_per_host_under_cap_rows_avoid_the_window(spark):
    """Plan shape: under-cap rows pass a broadcast LEFT-ANTI probe (no
    shuffle); only the over-cap head enters the window Exchange. Payload
    Exchanges: 1 (window); the count agg shuffles only (host,count) pairs."""
    df = spark.createDataFrame(QUOTA_ROWS, ["url", "text"])
    plan = W.cap_per_host(df, 2)._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan and "LeftSemi" in plan
    assert "BroadcastExchange" in plan
    # hash shuffles in the initial plan: the per-host count agg appears
    # under BOTH broadcast probes (identical subtrees — AQE reuses one at
    # runtime, and they carry only (host,count) pairs) plus ONE head-only
    # window shuffle. The page payload itself crosses exactly that one.
    assert plan.count("Exchange hashpartitioning") <= 3
    assert "partial_count" in plan  # the count agg combines map-side
    # exactly one Window node — and it sits on the semi-probed head branch,
    # so the anti-probed (under-cap) rows never sort/shuffle for ranking
    assert plan.count("Window [") == 1
    # Spark pushes the rank<=cap filter into a partial WindowGroupLimit:
    # even head rows prune to <=cap per map partition BEFORE shuffling
    assert "WindowGroupLimit" in plan and ", Partial" in plan


def test_host_extraction_spec_corners(spark):
    """Host = lowercased authority, stopping at '/', '?', or '#', any-case
    scheme — a blocked host must not evade its blocklist/cap via a query
    string directly after the authority or scheme-case games."""
    from pyspark.sql import functions as F

    from pii_detection_redaction_spark.operators.web import (
        filter_blocked_hosts_literal,
        host_col,
    )

    urls = [
        "http://blocked.com?x=1",      # query, no path slash
        "http://blocked.com#frag",     # fragment, no path slash
        "HTTP://blocked.com/page",     # scheme case
        "https://Blocked.COM/page",    # authority case
        "https+x.y://blocked.com/p",   # RFC-3986 scheme chars
        "http://fine.org/ok?x=1",
        "no-scheme-at-all",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = dict(
        df.select("url", host_col().alias("h")).collect()
    )
    assert got["http://blocked.com?x=1"] == "blocked.com"
    assert got["http://blocked.com#frag"] == "blocked.com"
    assert got["HTTP://blocked.com/page"] == "blocked.com"
    assert got["https://Blocked.COM/page"] == "blocked.com"
    assert got["https+x.y://blocked.com/p"] == "blocked.com"
    assert got["http://fine.org/ok?x=1"] == "fine.org"
    assert got["no-scheme-at-all"] == ""
    survivors = {
        r["url"]
        for r in filter_blocked_hosts_literal(df, ["blocked.com"]).collect()
    }
    assert survivors == {"http://fine.org/ok?x=1", "no-scheme-at-all"}


def test_host_key_strips_userinfo_and_port(spark):
    """The host KEY treats 'blocked.com:80', 'blocked.com:8080' and
    'u@blocked.com' as ONE host — otherwise the blocklist/quota is
    evadable by spelling; IPv6 bracket colons survive the port strip;
    NULL urls key to '' (one cappable group, not null-join fallthrough)."""
    from pii_detection_redaction_spark.operators.web import (
        cap_per_host,
        filter_blocked_hosts_literal,
        host_col,
    )

    urls = [
        "http://blocked.com/x",
        "http://blocked.com:80/x",
        "http://blocked.com:8080/x",
        "http://user@blocked.com/x",
        "http://[::1]:8080/x",
        "http://[::1]/y",
        None,
    ]
    df = spark.createDataFrame([(u, "t") for u in urls], ["url", "text"])
    got = dict(df.select("url", host_col().alias("h")).collect())
    assert got["http://blocked.com:8080/x"] == "blocked.com"
    assert got["http://user@blocked.com/x"] == "blocked.com"
    assert got["http://[::1]:8080/x"] == "[::1]" == got["http://[::1]/y"]
    assert got[None] == ""
    kept = filter_blocked_hosts_literal(df, ["blocked.com"]).collect()
    assert sorted(r["url"] or "" for r in kept) == [
        "", "http://[::1]/y", "http://[::1]:8080/x"
    ]
    # NULL urls form one capped '' group
    many_null = spark.createDataFrame(
        [(None, f"t{i}") for i in range(5)] + [("http://a.com/x", "s")],
        ["url", "text"],
    )
    capped = cap_per_host(many_null, cap=2)
    assert capped.filter(F.col("url").isNull()).count() == 2


def test_dedup_latest_crawl_null_urls_pass_through(spark):
    """NULL-url rows cannot be keyed: they pass through un-deduped
    (n_crawls=1 each) instead of collapsing N unrelated records into one
    NULL-partition survivor."""
    import datetime as _dt

    from pii_detection_redaction_spark.operators.web import dedup_latest_crawl

    t0 = _dt.datetime(2024, 1, 1)
    rows = [
        ("http://a.com/x", t0, "p1"),
        ("http://a.com/x", t0 + _dt.timedelta(days=1), "p2"),
        (None, t0, "junk1"),
        (None, t0, "junk2"),
    ]
    df = spark.createDataFrame(rows, ["url", "warc_ts", "payload"])
    out = dedup_latest_crawl(df)
    assert out.count() == 3  # one keyed survivor + both NULL rows
    nulls = out.filter(F.col("url").isNull()).collect()
    assert sorted(r["payload"] for r in nulls) == ["junk1", "junk2"]
    assert all(r["n_crawls"] == 1 for r in nulls)
    keyed = out.filter(F.col("url").isNotNull()).collect()
    assert len(keyed) == 1 and keyed[0]["payload"] == "p2"
    assert keyed[0]["n_crawls"] == 2
