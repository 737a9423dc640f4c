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
