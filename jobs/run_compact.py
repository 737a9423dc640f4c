#!/usr/bin/env python
"""spark-submit entry point for corpus COMPACTION: near-dedup across the
base corpus and every increment (the cross-batch clusters incremental
ingestion deliberately defers), re-shard, write a fresh corpus.

    spark-submit --py-files pii_spark.zip jobs/run_compact.py \
        --corpus s3://bucket/prepared/ --name 2026-09

Local smoke (after run_prepare + run_ingest):

    python jobs/run_compact.py --corpus _data/prepared --name c1
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--corpus", required=True, help="prepared-corpus root")
    p.add_argument("--name", default="compact",
                   help="output under compacted/<name>/final")
    p.add_argument("--near-threshold", type=float, default=0.8)
    p.add_argument("--master", default=None)
    args = p.parse_args()

    from pii_detection_redaction_spark.plans.ingest import compact_corpus
    from pii_detection_redaction_spark.plans.session import build_session

    spark = build_session(app_name=f"pii-compact-{args.name}", master=args.master)
    counters = compact_corpus(
        spark, args.corpus, args.name, near_threshold=args.near_threshold
    )
    print(json.dumps(counters))
    spark.stop()


if __name__ == "__main__":
    main()
