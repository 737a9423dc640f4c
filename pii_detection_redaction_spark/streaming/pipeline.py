"""Structured Streaming variant of the quality-filter + scrub pipeline.

The reference is strictly batch (SURVEY.md §2.10) and the north rule's
resume semantics are snapshot-based batch, so streaming is a *thin* adapter:
the same ``transform_pages`` stage graph applied to a file-source stream.
All UDFs are stateless per-document, so the streaming plan needs no state
store or watermark; exactly-once comes from the file-sink commit log +
checkpoint, the streaming twin of the snapshot store.

Use ``trigger(availableNow=True)`` for incremental batch drains — the
streaming-native equivalent of the snapshot resume loop (new files since the
last checkpoint are processed exactly once).
"""

from __future__ import annotations

from dataclasses import replace
from typing import Optional

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..plans.pipeline import OUTPUT_COLUMNS, PipelineConfig, transform_pages, with_bucket

PAGES_DDL = "url string, warc_ts timestamp, html binary, text string, lang string"


def stream_pipeline(
    spark: SparkSession,
    pages_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    cfg: Optional[PipelineConfig] = None,
    available_now: bool = True,
):
    """Returns the started StreamingQuery; caller awaits termination."""
    cfg = cfg or PipelineConfig()
    if cfg.quality_model is not None and not cfg.quality_classifier:
        # normalize ONCE, exactly like run_pipeline (plans/pipeline.py): a
        # supplied model implies the annotation — every later check keys on
        # cfg.quality_classifier alone, so the implication has one spelling
        cfg = replace(cfg, quality_classifier=True)
    if cfg.strip_boilerplate:
        # corpus-level hot-line derivation is a batch pass over the WHOLE
        # input — there is no streaming equivalent here (a per-micro-batch
        # hot set would be a different, weaker spec). Refuse loudly rather
        # than silently emitting boiler_removed=0 for a config the batch
        # path honors.
        raise ValueError(
            "strip_boilerplate is batch-only (corpus-level hot-line pass); "
            "run run_pipeline, or pre-strip with a batch pass before "
            "streaming ingestion"
        )
    stream = (
        spark.readStream.schema(PAGES_DDL)
        .format("parquet")
        .load(pages_dir)
    )
    out_cols = OUTPUT_COLUMNS + (
        # same column contract as the batch run_pipeline (cfg normalized
        # above, so the one flag carries the whole implication)
        ["quality_prob"] if cfg.quality_classifier else []
    )
    out = transform_pages(with_bucket(stream, cfg), cfg).select(*out_cols)
    writer = (
        out.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
