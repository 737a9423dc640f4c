"""Token-shard packing — assign documents to fixed-token-budget shards for
training export.

A trainer wants ~uniform shards ("2 000 tokens per shard file") in a
DETERMINISTIC, partitioning-independent order, which means a global running
token total — a prefix sum over the whole corpus. A single Window over a
global ORDER BY is the textbook non-scalable plan (one partition does all
the work); the distributed form is the classic two-phase prefix sum:

1. order the corpus by (ticket, doc_id) where ticket = md5(doc_id) — a
   deterministic shuffle both engines compute identically (and a free
   shard-content randomizer: hash order decorrelates shard composition from
   crawl order, which training wants anyway);
2. bucket by the ticket's first hex chars -> buckets are CONTIGUOUS RANGES
   of the global order, so each bucket's running sum is independent window
   work (parallel, one Exchange on bucket);
3. per-bucket token totals (tiny: one row per bucket) come to the driver,
   their exclusive prefix sums become each bucket's global offset,
   broadcast back as a 16/256-row join.

global_start(doc) = bucket_offset + in-bucket running sum - n_tokens;
shard_id = floor(global_start / shard_tokens). A document landing on a
boundary belongs to the shard its FIRST token falls in (greedy fill,
oversized spill — document-level assignment, documents are not split).

The DuckDB oracle runs the single global window instead — the differential
proves two-phase == global prefix sum exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SHARD_TOKENS = 2_000  # catalog-query shard budget
BUCKET_HEX = 1  # 16 range-buckets; use 2 (256) at production scale


def token_shards(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    shard_tokens: int = SHARD_TOKENS,
    bucket_hex: int = BUCKET_HEX,
) -> DataFrame:
    """(id, n_tokens, start_offset, shard_id) — deterministic global packing
    order (md5 ticket), distributed prefix sum, document-level shards."""
    d = df.select(
        F.col(id_col),
        F.col(tokens_col).cast("long").alias("__n"),
        F.md5(F.col(id_col).cast("string")).alias("__ticket"),
    ).withColumn("__bucket", F.substring("__ticket", 1, bucket_hex))

    agg = d.groupBy("__bucket").agg(
        F.sum("__n").alias("total"),
        F.count(F.when(F.col("__n").isNull(), 1)).alias("nulls"),
    ).collect()
    bad = sum(r["nulls"] for r in agg)
    if bad:
        # a NULL token count would make its doc's start_offset/shard_id
        # NULL silently (F.sum skips NULLs, so later docs still pack) —
        # an unassigned document in a training export with no error.
        # That is an upstream counting bug; fail the export loudly.
        raise ValueError(
            f"token_shards: {bad} row(s) have NULL {tokens_col} — every "
            f"document must carry a token count before packing"
        )
    totals = {r["__bucket"]: r["total"] for r in agg}
    offsets, acc = [], 0
    for b in sorted(totals):
        offsets.append((b, acc))
        acc += totals[b]
    spark = df.sparkSession
    odf = spark.createDataFrame(offsets, "__bucket string, __offset long")

    w = (
        Window.partitionBy("__bucket")
        .orderBy("__ticket", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.col("__offset") + F.sum("__n").over(w) - F.col("__n")
    return (
        d.join(F.broadcast(odf), "__bucket")
        .withColumn("start_offset", start)
        .withColumn(
            # integer division (div), not floor(double /): start_offset is
            # a long and at real corpus scale cumulative token totals pass
            # 2^53, where the double round-trip can misplace a boundary
            # doc by one shard. div is exact at any magnitude (and
            # start_offset is never negative, so div == floor-div).
            "shard_id", F.expr(f"start_offset div {int(shard_tokens)}")
        )
        .select(
            F.col(id_col),
            F.col("__n").alias(tokens_col),
            "start_offset",
            "shard_id",
        )
    )
