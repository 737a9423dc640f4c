"""The flagship pipeline: extract → langid → quality → detect → scrub → sink.

Spark-first assembly of the reference's text pipeline (entry point B,
``text_detector/cli.py`` → SURVEY.md §3.2) extended with the north-rule
quality-filter stages. The plan is one narrow pipeline per bucket group —
parquet scan (column-pruned) → codegen'd quality expressions → Arrow UDFs →
write — with shuffles only at the explicit url-hash repartition and the
metrics aggregation.

Scale design:
- url-hash bucketing: ``bucket = pmod(xxhash64(url), num_buckets)`` spreads
  load uniformly regardless of host skew (distinct urls hash uniformly);
- host skew is still visible to host-keyed *aggregations* (per-host lineage
  metrics), so those run as salted two-stage aggs: partial
  ``groupBy(host, salt)`` then final ``groupBy(host)`` — a Zipf host holding
  40% of rows is split across SALT_BUCKETS reducers first;
- counters use ``df.observe`` (no extra pass over the data);
- checkpoint-resume: bucket groups are the commit unit (sources.snapshots).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from ..core import quality as Q
from ..functions.quality import (
    add_quality_columns,
    drop_reasons_column,
    mask_toxicity_column,
)
from ..functions.udfs import (
    extract_text_expr,
    make_detect_scrub_udf,
    make_langid_ppl_udf,
)
from ..sources.snapshots import SnapshotStore

SALT_BUCKETS = 16


@dataclass
class PipelineConfig:
    num_buckets: int = 64
    groups: int = 4  # commit units (bucket groups) per full run
    entities: Optional[Sequence[str]] = None
    min_score: float = 0.0
    chunk_size: int = 5000
    chunk_overlap: int = 300
    scrub_mode: str = "relationship"
    extract_from_html: bool = True
    salt_buckets: int = SALT_BUCKETS
    extra: Dict = field(default_factory=dict)


def with_bucket(df: DataFrame, cfg: PipelineConfig) -> DataFrame:
    return df.withColumn(
        "bucket", F.pmod(F.xxhash64(F.col("url")), F.lit(cfg.num_buckets)).cast("int")
    ).withColumn("grp", (F.col("bucket") % cfg.groups).cast("int"))


def transform_pages(df: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Pure transformation: pages(url, warc_ts, html, text, lang) → enriched
    frame with extraction, langid, perplexity, quality, detections, scrub.

    Physical shape (deliberate): exactly TWO Python eval nodes — fused
    langid+perplexity and fused detect+scrub — with extraction and all
    quality rules as codegen'd JVM expressions. Five separate UDF stages
    measured ~2x slower end-to-end from per-stage Arrow round-trips.
    Counter-intuitive but measured: hoisting langid to JVM ``regexp_count``
    columns (functions.langid_expr) was tried and is 2.5x SLOWER than the
    fused pandas UDF at 16 cores (17-19s vs 7.3s per 100k docs, and the
    7.3s includes perplexity) — Java regex case-insensitive alternations
    lose badly to pandas' C ``str.count`` loop; the Arrow transfer is not
    the bottleneck at this row width.
    """
    langid_ppl_udf = make_langid_ppl_udf()
    detect_scrub_udf = make_detect_scrub_udf(
        entities=cfg.entities,
        min_score=cfg.min_score,
        size=cfg.chunk_size,
        overlap=cfg.chunk_overlap,
        mode=cfg.scrub_mode,
    )

    if cfg.extract_from_html and "html" in df.columns:
        # byte-identical per-url extraction invariant: extracted text IS the
        # canonical text downstream; extract_ok lineage flags divergence from
        # any pre-existing text column. JVM-side inverse of the page
        # structure (functions.udfs.extract_text_expr).
        df = df.withColumn("extracted_text", extract_text_expr(F.col("html")))
        if "text" in df.columns:
            df = df.withColumn(
                "extract_ok", F.col("extracted_text") == F.col("text")
            ).drop("text")
        else:
            df = df.withColumn("extract_ok", F.lit(True))
        df = df.withColumnRenamed("extracted_text", "text")
    else:
        df = df.withColumn("extract_ok", F.lit(True))

    df = df.withColumn("lid", langid_ppl_udf(F.col("text")))
    df = (
        df.withColumn("lang_pred", F.col("lid.lang"))
        .withColumn("lang_conf", F.col("lid.conf"))
        .withColumn("ppl", F.col("lid.ppl"))
        .drop("lid")
    )
    df = add_quality_columns(df, "text", "lang_pred")
    df = df.withColumn("drop_reasons", drop_reasons_column("lang_conf", "ppl"))
    df = df.withColumn("keep", F.size("drop_reasons") == 0)

    # Detection+scrub only on kept docs: when() short-circuit is not
    # guaranteed for UDFs, so gate via the input — the UDF sees '' for
    # dropped docs and returns ([], '') at near-zero cost.
    df = df.withColumn(
        "ds",
        detect_scrub_udf(F.when(F.col("keep"), F.col("text")).otherwise(F.lit(""))),
    )
    df = (
        df.withColumn("detections", F.col("ds.detections"))
        .withColumn(
            # toxicity-scrub composition (north_star): kept docs get residual
            # lexicon hits masked AFTER the PII scrub — JVM regexp_replace,
            # same regex/label as core.toxicity.mask_toxicity. Docs above the
            # hit threshold never reach here (dropped by rule_toxicity).
            "scrubbed_text",
            F.when(
                F.col("keep"), mask_toxicity_column(F.col("ds.scrubbed_text"))
            ).otherwise(F.lit(None)),
        )
        .drop("ds")
    )
    df = df.withColumn("n_entities_scrubbed", F.size("detections"))
    return df


OUTPUT_COLUMNS = [
    "url",
    "warc_ts",
    "bucket",
    "lang",
    "lang_pred",
    "lang_conf",
    "ppl",
    "keep",
    "drop_reasons",
    "extract_ok",
    "detections",
    "scrubbed_text",
    "n_entities_scrubbed",
    "n_chars",
    "n_words",
    "tox_hits",
]


def host_metrics(df: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Per-host lineage counters via salted two-stage aggregation.

    Stage 1 shuffles on (host, salt) — skewed hosts split across
    ``salt_buckets`` reducers; stage 2 reduces ``hosts x salt`` pre-aggregated
    rows, which is tiny. Deterministic salt = pmod(xxhash64(url), S).
    """
    host = F.regexp_extract(F.col("url"), r"https?://([^/]+)/", 1).alias("host")
    salt = F.pmod(F.xxhash64(F.col("url")), F.lit(cfg.salt_buckets)).alias("salt")
    partial = (
        df.select(host, salt, "keep", "n_entities_scrubbed")
        .groupBy("host", "salt")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum(F.col("keep").cast("long")).alias("kept"),
            F.sum("n_entities_scrubbed").alias("entities"),
        )
    )
    return (
        partial.groupBy("host")
        .agg(
            F.sum("docs").alias("docs_seen"),
            F.sum("kept").alias("docs_kept"),
            (F.sum("docs") - F.sum("kept")).alias("docs_dropped"),
            F.sum("entities").alias("entities_scrubbed"),
        )
        .orderBy("host")
    )


def run_pipeline(
    spark: SparkSession,
    pages_path: str,
    out_root: str,
    cfg: Optional[PipelineConfig] = None,
    resume: bool = True,
) -> Dict[str, int]:
    """Batch run with snapshot commits per bucket group; resumable.

    Returns the accumulated counters across all snapshots (including any from
    prior partial runs when resuming).
    """
    cfg = cfg or PipelineConfig()
    store = SnapshotStore(out_root)
    done = store.committed_groups() if resume else set()

    raw = spark.read.parquet(pages_path)
    pages = with_bucket(raw, cfg)
    # The heavy Arrow-UDF work must be spread over >= ~2 tasks/core. If the
    # scan's natural split (files / row groups) is already fine-grained, the
    # extra exchange is pure cost (measured ~7s for 50k docs: row
    # serialization of html+text through the shuffle); only repartition when
    # the input layout is coarser than the target parallelism.
    scan_parts = raw.rdd.getNumPartitions()
    n_parts = max(1, cfg.num_buckets // cfg.groups)
    target = min(n_parts, 2 * spark.sparkContext.defaultParallelism)
    need_repartition = scan_parts < max(2, target // 2)

    for gid in range(cfg.groups):
        if gid in done:
            continue
        obs = Observation(f"grp-{gid}")
        part = pages.filter(F.col("grp") == gid)
        if need_repartition:
            part = part.repartition(n_parts, "bucket")
        out = transform_pages(part, cfg).select(*OUTPUT_COLUMNS)
        out = out.observe(
            obs,
            F.count(F.lit(1)).alias("docs_seen"),
            F.sum(F.col("keep").cast("long")).alias("docs_kept"),
            F.sum("n_entities_scrubbed").alias("entities_scrubbed"),
            F.sum((~F.col("extract_ok")).cast("long")).alias("extract_mismatch"),
            # tox_masked = lexicon hits in the RAW text of kept docs — an
            # upper bound on tokens actually replaced by <TOXIC>, since a hit
            # inside a detected PII span is removed by the scrub before
            # masking. Counting post-scrub would need a second regexp pass
            # over every kept doc; the bound is documented instead.
            F.sum(F.when(F.col("keep"), F.col("tox_hits")).otherwise(F.lit(0)))
            .alias("tox_masked"),
        )
        gpath = store.group_path(gid)
        # already partitioned by bucket upstream → one file per bucket task;
        # mode=overwrite keeps retries idempotent.
        out.write.mode("overwrite").parquet(gpath)
        counters = {k: int(v or 0) for k, v in obs.get.items()}
        counters["docs_dropped"] = counters["docs_seen"] - counters["docs_kept"]
        store.commit([gid], [gpath], counters)

    return store.counters()


def read_output(spark: SparkSession, out_root: str) -> DataFrame:
    store = SnapshotStore(out_root)
    paths = store.data_paths()
    if not paths:
        raise FileNotFoundError(f"no committed snapshots under {out_root}")
    return spark.read.parquet(*paths)
