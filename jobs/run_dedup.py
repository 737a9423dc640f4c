#!/usr/bin/env python
"""spark-submit entry point for the post-scrub exact-dedup pass.

    spark-submit --py-files pii_spark.zip jobs/run_dedup.py \
        --input s3://bucket/scrubbed/ --output s3://bucket/final/

Local smoke:

    python jobs/run_dedup.py --input _data/vout --output _data/final
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="scrub-pipeline snapshot root")
    p.add_argument("--output", required=True, help="final deduped table path")
    p.add_argument("--report", action="store_true",
                   help="also print the duplicate-group audit counts")
    p.add_argument("--near", action="store_true",
                   help="MinHash-LSH near-dup removal (transitive clusters)"
                        " instead of exact dedup")
    p.add_argument("--threshold", type=float, default=0.8,
                   help="k-gram Jaccard threshold for --near")
    p.add_argument("--num-hashes", type=int, default=16,
                   help="MinHash signature length for --near")
    p.add_argument("--band-size", type=int, default=4,
                   help="LSH band width r for --near: candidate recall is"
                        " P=1-(1-s^r)^(num_hashes/r) — lower r for lower"
                        " thresholds, at higher join fan-out")
    p.add_argument("--master", default=None)
    args = p.parse_args()

    from pii_detection_redaction_spark.plans.dedup_pass import (
        dedup_pass,
        duplicate_report,
        near_dedup_pass,
    )
    from pii_detection_redaction_spark.plans.session import build_session

    spark = build_session(app_name="pii-dedup-pass", master=args.master)
    if args.near:
        counters = near_dedup_pass(spark, args.input, args.output,
                                   threshold=args.threshold,
                                   num_hashes=args.num_hashes,
                                   band_size=args.band_size)
    else:
        counters = dedup_pass(spark, args.input, args.output)
    if args.report:
        counters["dup_groups"] = duplicate_report(spark, args.input).count()
    print(json.dumps(counters))
    spark.stop()


if __name__ == "__main__":
    main()
