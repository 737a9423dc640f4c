#!/usr/bin/env python
"""Benchmark harness (driver contract + scaling evidence).

Default run:
  - headline queries over $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
    on local[$SPARK_GRAFT_CPUS];
  - the full quality-filter + scrub pipeline over the synthetic pages corpus
    at the matching scale, executed at TWO parallelism levels (local[8] and
    local[32] by default) on the same input — the sandbox evidence for the
    north rule's N vs 4N executor scaling-efficiency criterion;
  - prints ONE JSON line:
      {"metric": ..., "value": secs, "unit": "sec", "queries": {...},
       "sf": ..., "pipeline": {...}, "scaling": {...}}

Flags: --skip-scaling (queries only), --scaling-only.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 32))
SCALE_LO = int(os.environ.get("BENCH_CORES_LO", 8))
SCALE_HI = int(os.environ.get("BENCH_CORES_HI", 32))

HEADLINE = [
    "pricing_summary",
    "region_revenue",
    "order_rank_per_customer",
    "events_sessionized",
    "doc_quality_agg",
    "langid_documents",
    "minhash_bands",
    "simhash",
    "embedding_topk",
    "severity_rollup",
    "pii_entity_counts",
    "pii_scrub",
    "quality_pipeline",
]


def _sf_label(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.0


def _pages_path(sf: float) -> str:
    from pii_detection_redaction_spark.testing.corpus import SF_ROWS, write_pages_parquet

    n = SF_ROWS.get(str(sf), 5000)
    os.makedirs(os.path.join(REPO, "_data"), exist_ok=True)
    path = os.path.join(REPO, "_data", f"pages_sf{sf}_multi")
    if not os.path.exists(path):
        write_pages_parquet(path, n, n_files=64)
    return path, n


def run_queries(sf_dir: str) -> dict:
    from pii_detection_redaction_spark.plans.queries import QUERIES
    from pii_detection_redaction_spark.plans.session import build_session

    spark = build_session(app_name="bench-queries", master=f"local[{CPUS}]",
                          shuffle_partitions=CPUS)
    timings = {}
    try:
        spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup
        for name in HEADLINE:
            fn = QUERIES[name]
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            # noop sink: forces full materialization of every column (count()
            # would let Catalyst prune the expensive UDF columns away)
            df.write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 3)
            print(f"  {name}: {timings[name]}s", file=sys.stderr)
    finally:
        spark.stop()
    return timings


def _warm_python_workers(spark, cores: int, cfg, pages_path: str) -> None:
    """Warm the session to steady state before timing: python-worker
    fork/imports/Arrow init AND JVM JIT of the codegen'd quality expressions,
    which needs realistic data (measured ~17s of one-time JIT on the first
    real batch). Runs the full transform over a 1/8 url-hash sample with a
    noop sink — we measure steady-state throughput, not cluster cold-start,
    matching how a long-running 100 TB job amortizes."""
    from pyspark.sql import functions as F

    from pii_detection_redaction_spark.plans.pipeline import transform_pages, with_bucket

    sample = (
        with_bucket(spark.read.parquet(pages_path), cfg)
        .filter(F.col("bucket") % 8 == 0)
        .repartition(cfg.num_buckets, "bucket")
    )
    transform_pages(sample, cfg).write.format("noop").mode("overwrite").save()


def run_pipeline_at(cores: int, pages_path: str, n_docs: int, out_dir: str) -> dict:
    import shutil

    from pii_detection_redaction_spark.plans.pipeline import PipelineConfig, run_pipeline
    from pii_detection_redaction_spark.plans.session import build_session

    shutil.rmtree(out_dir, ignore_errors=True)
    spark = build_session(app_name=f"bench-pipeline-{cores}",
                          master=f"local[{cores}]", shuffle_partitions=cores)
    # 8 partitions per core: doc-length skew makes task durations uneven, so
    # fine granularity keeps all cores busy through the tail (2 coarse waves
    # would leave a straggler bounding the wall clock)
    cfg = PipelineConfig(num_buckets=cores * 8, groups=1)
    try:
        _warm_python_workers(spark, cores, cfg, pages_path)
        t0 = time.perf_counter()
        counters = run_pipeline(spark, pages_path, out_dir, cfg)
        secs = time.perf_counter() - t0
    finally:
        spark.stop()
    return {
        "cores": cores,
        "seconds": round(secs, 3),
        "docs": n_docs,
        "docs_per_sec": round(n_docs / secs, 1),
        "docs_kept": counters.get("docs_kept", 0),
    }


def main() -> None:
    skip_scaling = "--skip-scaling" in sys.argv
    scaling_only = "--scaling-only" in sys.argv
    sf = _sf_label(SF_DIR)
    result = {"metric": "total_bench_seconds", "unit": "sec", "sf": sf, "queries": {}}
    total = 0.0

    pages_path, n_docs = _pages_path(sf)

    if not scaling_only:
        timings = run_queries(SF_DIR)
        result["queries"] = timings
        total += sum(timings.values())

    if not skip_scaling:
        out = os.path.join(REPO, "_data", "bench_pipe_out")
        lo = run_pipeline_at(SCALE_LO, pages_path, n_docs, out + "_lo")
        hi = run_pipeline_at(SCALE_HI, pages_path, n_docs, out + "_hi")
        speedup = lo["seconds"] / hi["seconds"]
        ratio = SCALE_HI / SCALE_LO
        eff = speedup / ratio
        result["pipeline"] = hi
        result["scaling"] = {
            "cores_lo": SCALE_LO,
            "cores_hi": SCALE_HI,
            "docs_per_sec_lo": lo["docs_per_sec"],
            "docs_per_sec_hi": hi["docs_per_sec"],
            "speedup": round(speedup, 3),
            "efficiency": round(eff, 3),
        }
        total += lo["seconds"] + hi["seconds"]

    result["value"] = round(total, 3)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
