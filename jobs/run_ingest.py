#!/usr/bin/env python
"""spark-submit entry point for INCREMENTAL ingestion: add a new crawl
batch to a corpus previously built by jobs/run_prepare.py, admitting only
never-seen documents (canonical-URL Bloom gate + content-hash check).

    spark-submit --py-files pii_spark.zip jobs/run_ingest.py \
        --corpus s3://bucket/prepared/ --input s3://bucket/crawl-2026-08-18/ \
        --name 2026-08-18

Local smoke (after run_prepare):

    python jobs/run_ingest.py --corpus _data/prepared \
        --input _data/batch.parquet --name day2
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--corpus", required=True,
                   help="prepared-corpus root (has final/ from run_prepare)")
    p.add_argument("--input", required=True, help="new crawl batch")
    p.add_argument("--name", required=True,
                   help="increment name (output under increments/<name>/)")
    p.add_argument("--format", default="parquet",
                   choices=("parquet", "warc", "jsonl"))
    p.add_argument("--strip-boilerplate", action="store_true")
    p.add_argument("--decontam", default=None, metavar="PARQUET",
                   help="eval-set parquet: drop increment docs sharing any "
                        "word n-gram with it (same gate as run_prepare)")
    p.add_argument("--decontam-text-col", default="text")
    p.add_argument("--master", default=None)
    args = p.parse_args()

    from pii_detection_redaction_spark.plans.ingest import ingest_increment
    from pii_detection_redaction_spark.plans.pipeline import PipelineConfig
    from pii_detection_redaction_spark.plans.session import build_session

    spark = build_session(app_name=f"pii-ingest-{args.name}", master=args.master)
    counters = ingest_increment(
        spark,
        args.input,
        args.corpus,
        args.name,
        cfg=PipelineConfig(strip_boilerplate=args.strip_boilerplate),
        input_format=args.format,
        decontam_path=args.decontam,
        decontam_text_col=args.decontam_text_col,
    )
    print(json.dumps(counters))
    spark.stop()


if __name__ == "__main__":
    main()
