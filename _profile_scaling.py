"""Throwaway profiling harness (not committed): where does the non-scaling
time go?  Runs the pipeline at a given core count in a fresh pinned process
and reports per-phase wall time:
  - noop: transform_pages -> noop sink (pure compute, no write/commit)
  - write: full run_pipeline (write parquet + snapshot commit)
"""
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def worker(cores: int, pages_path: str) -> None:
    import bench
    from pii_detection_redaction_spark.plans.pipeline import (
        PipelineConfig, run_pipeline, transform_pages, with_bucket)
    from pii_detection_redaction_spark.plans.session import build_session

    os.sched_setaffinity(0, bench._idlest_cpus(cores))
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "12g")
    out_dir = os.path.join(REPO, "_data", f"prof_out_{cores}")
    shutil.rmtree(out_dir, ignore_errors=True)
    spark = build_session(app_name=f"prof-{cores}", master=f"local[{cores}]",
                          shuffle_partitions=cores)
    cfg = PipelineConfig(num_buckets=cores * 8, groups=1)
    res = {"cores": cores}
    try:
        t0 = time.perf_counter()
        bench._warm_python_workers(spark, cores, cfg, pages_path)
        res["warm"] = round(time.perf_counter() - t0, 2)

        from pyspark.sql import functions as F
        pages = with_bucket(spark.read.parquet(pages_path), cfg)
        t0 = time.perf_counter()
        transform_pages(pages, cfg).write.format("noop").mode("overwrite").save()
        res["noop"] = round(time.perf_counter() - t0, 2)

        t0 = time.perf_counter()
        run_pipeline(spark, pages_path, out_dir, cfg)
        res["full"] = round(time.perf_counter() - t0, 2)

        # second noop to check drift
        t0 = time.perf_counter()
        transform_pages(pages, cfg).write.format("noop").mode("overwrite").save()
        res["noop2"] = round(time.perf_counter() - t0, 2)
    finally:
        spark.stop()
    print(json.dumps(res))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker(int(sys.argv[2]), sys.argv[3])
    else:
        import subprocess
        import bench
        sf = bench._sf_label(bench.SF_DIR)
        pages_path, n = bench._pages_path(sf, bench.SCALE_DOCS_MULT)
        for cores in [16, 4, 16, 4]:
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "worker",
                 str(cores), pages_path],
                capture_output=True, text=True)
            line = p.stdout.strip().splitlines()[-1] if p.stdout.strip() else p.stderr[-500:]
            print(line, flush=True)
