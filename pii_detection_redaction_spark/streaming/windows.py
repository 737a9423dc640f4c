"""Event-time windowed aggregation with watermarks (Structured Streaming).

The reference has no streaming surface (SURVEY.md §2.10); this provides the
standard late-data-tolerant rollup the north-star pipeline would use for
continuous ingestion monitoring: per event-time window counts with a
watermark bounding state. State is keyed by (window, event_type) — bounded
by watermark horizon / window size, independent of stream length.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    group_col: str = "event_type",
    value_col: Optional[str] = "value",
) -> DataFrame:
    """Works on both batch and streaming frames (same plan shape; watermark
    is a no-op in batch). ``value_col=None`` yields counts only — any other
    column set is fine; nothing beyond ``ts_col``/``group_col`` is required.

    Precondition: a UTC session (plans.session pins one). The streaming path
    casts NTZ to session-time TIMESTAMP for the watermark; under a non-UTC
    session the batch (NTZ wall-clock) and streaming (LTZ epoch) window
    boundaries would differ by the zone offset.
    """
    df = events
    if df.isStreaming:
        # watermarks require TIMESTAMP (ltz); parquet NTZ columns cast
        # losslessly under the UTC session (precondition above)
        if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
            df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        df = df.withWatermark(ts_col, watermark)
    aggs = [F.count(F.lit(1)).alias("n_events")]
    out_cols = ["n_events"]
    if value_col is not None:
        aggs.append(F.round(F.sum(value_col), 2).alias(f"sum_{value_col}"))
        out_cols.append(f"sum_{value_col}")
    return (
        df.groupBy(F.window(F.col(ts_col), window).alias("w"), group_col)
        .agg(*aggs)
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            group_col,
            *out_cols,
        )
    )
