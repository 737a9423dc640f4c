"""Bucketed-table helpers: shuffle-free co-located joins.

At 100 TB the dominant join cost is the shuffle. Persisting both sides
bucketed (+sorted) on the join key lets Catalyst plan a sort-merge join with
ZERO Exchange — each task reads matching bucket files from both tables. This
is the batch analog of co-partitioned stream-stream joins and the right
layout for repeatedly-joined fact tables (e.g. detections ⋈ documents).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: str | Sequence[str],
    num_buckets: int = 16,
    sort_cols: str | Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    # normalize: a bare string is one column, not a sequence of chars —
    # splatting 'url' would silently bucketBy(16, 'u', 'r', 'l')
    if isinstance(bucket_cols, str):
        bucket_cols = [bucket_cols]
    if isinstance(sort_cols, str):
        sort_cols = [sort_cols]
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, on: Sequence[str],
    how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables; plan contains no Exchange when bucket
    specs line up (verified by tests/test_plans.py)."""
    return spark.table(left_table).join(spark.table(right_table), list(on), how)
