"""Custom join operators Spark lacks natively: as-of join and range join.

The reference repo has no relational joins at all (SURVEY.md §2.3 — its
closest analogs are per-document span assignments); these operators are part
of the training-data-pipeline surface (event attribution, interval tagging)
and are built as compositions of existing DataFrame ops, per the
"composition first, UDF only if semantics demand" rule.

as-of join — union + running-window technique
  One shuffle total (the window's ``partitionBy(key)``), no range explosion,
  no per-key collect: union the tagged sides, sort within each key partition
  by (ts, side) so right rows at equal timestamps precede left rows
  (backward/inclusive semantics), then carry the latest right payload forward
  with ``last(ignorenulls=True)`` over an unbounded-preceding row frame.
  Scale: cost is one sort-shuffle of |L|+|R| rows on the join key — the same
  shape as a sort-merge join; skewed keys split fine under AQE because the
  window frame is row-based and per-key.

range join — bin bucketing
  Joining points to intervals with a raw ``lo <= p AND p < hi`` predicate
  gives Spark a BroadcastNestedLoopJoin (O(|P|·|I|) compares). Bucketing to
  bins of width ``bin_size`` turns it into an equi-join on the bin id: each
  interval is exploded to the bins it covers, each point maps to exactly one
  bin, and the exact predicate re-filters inside the bin. Cost drops to
  O(|P| + |I|·bins_per_interval) with an AQE-managed hash shuffle — the
  standard trick for genomic/telemetry interval joins at scale.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    tiebreak: Optional[str] = None,
) -> DataFrame:
    """Backward (inclusive) as-of join: for every left row, attach
    ``value_cols`` from the right row with the greatest ``right_ts`` <=
    ``left_ts`` for the same ``key`` (null struct fields when none exists —
    left-outer semantics).

    When several right rows share (key, right_ts), the winner is the one with
    the greatest ``tiebreak`` column (required then for determinism;
    irrelevant when (key, right_ts) is unique).

    NULL semantics match SQL joins: right rows with a NULL key or NULL
    ``right_ts`` never match anything (they are dropped from the right
    side — Spark's default nulls-first ordering would otherwise make a
    NULL-ts row an infinitely-OLD match for every left row, and
    partitionBy groups NULL keys together so NULL-key left rows would
    pick up NULL-key right payloads). Left rows always survive
    (left-outer), with null value fields.

    ``value_cols`` must not collide with ``left.columns`` — the output
    carries both sets flat, and a silent duplicate column poisons every
    downstream ``F.col``; checked loudly.
    """
    dup = sorted(set(value_cols) & set(left.columns))
    if dup:
        raise ValueError(
            f"asof_join value_cols {dup} collide with left columns — "
            f"alias them on the right side first"
        )
    row_type = left.select(
        F.struct(*[F.col(c) for c in left.columns]).alias("__row")
    ).schema["__row"].dataType
    val_struct = F.struct(*[F.col(c) for c in value_cols])
    val_type = right.select(val_struct.alias("__vals")).schema["__vals"].dataType

    order_cols: List[Column] = [F.col("__ts"), F.col("__side")]
    if tiebreak is not None:
        r_tb = F.col(tiebreak)
        order_cols.append(F.col("__tb"))
    else:
        r_tb = F.lit(0)

    r = right.filter(
        F.col(key).isNotNull() & F.col(right_ts).isNotNull()
    ).select(
        F.col(key).alias("__key"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        r_tb.alias("__tb"),
        val_struct.alias("__vals"),
        F.lit(None).cast(row_type).alias("__row"),
    )
    l = left.select(
        F.col(key).alias("__key"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(0).alias("__tb"),
        F.lit(None).cast(val_type).alias("__vals"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__row"),
    )
    w = (
        Window.partitionBy("__key")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        r.unionByName(l)
        .withColumn("__m", F.last("__vals", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    out_cols = [F.col(f"__row.{c}").alias(c) for c in left.columns]
    out_cols += [F.col(f"__m.{c}").alias(c) for c in value_cols]
    return matched.select(*out_cols)


def bin_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_size: float,
) -> DataFrame:
    """Inner-join point rows to interval rows on ``lo <= point < hi`` via bin
    bucketing (equi-join on the bin id, exact predicate re-checked inside).

    Columns from both sides are preserved, so the two schemas must be
    DISJOINT (checked loudly — a shared name would either raise an
    ambiguous-reference error at the filter or silently emit duplicate
    output columns, depending on which name collides). Intervals must be
    half-open and may overlap (a point matches every covering interval).
    Inner-only by design: the exact range predicate is applied as a
    post-join filter, which would silently drop the null-extended rows of
    any outer mode.
    """
    dup = sorted(set(points.columns) & set(intervals.columns))
    if dup:
        raise ValueError(
            f"bin_range_join: columns {dup} exist on both sides — alias "
            f"one side first (both schemas are preserved flat)"
        )
    p = points.withColumn(
        "__bin", F.floor(F.col(point_col) / F.lit(bin_size)).cast("long")
    )
    iv = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(bin_size)).cast("long"),
                # hi exactly on a bin edge contributes one spurious bin; the
                # exact predicate below filters it (cheaper than edge math)
                F.floor(F.col(hi_col) / F.lit(bin_size)).cast("long"),
            )
        ),
    )
    joined = p.join(iv, "__bin").filter(
        (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col))
    )
    return joined.drop("__bin")
