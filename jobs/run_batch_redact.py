#!/usr/bin/env python
"""spark-submit entry point for batch redaction with a zip bundle — the
distributed analog of the reference's batch UI flow (multiple uploaded
files → per-file redactor → one downloadable zip; ``interface/csv_tab.py``
batch loop + ``interface/helpers.py:169-175`` create_zip_from_files).

    python jobs/run_batch_redact.py --input in_dir/ --output out_dir/ \
        [--labels] [--delimiter ';'] [--min-score 0.3] [--no-json] \
        [--entities EMAIL_ADDRESS financial] [--scrub-mode mask]

Prints the manifest JSON (per-file summaries + totals) on stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="dir of .csv/.txt files")
    p.add_argument("--output", required=True, help="output dir (files + zip)")
    p.add_argument("--delimiter", default=",")
    p.add_argument("--no-header", action="store_true")
    p.add_argument("--labels", action="store_true",
                   help="CSV cells: replace with <ENTITY_TYPE> labels")
    p.add_argument("--scrub-mode", default="relationship",
                   choices=["mask", "replace", "relationship"],
                   help="TXT files: scrub operator")
    p.add_argument("--min-score", type=float, default=0.0)
    p.add_argument("--entities", nargs="*", default=None)
    p.add_argument("--no-json", action="store_true",
                   help="skip the per-file detections JSON")
    p.add_argument("--zip-name", default="redacted_bundle.zip")
    p.add_argument("--multiline", action="store_true",
                   help="RFC-4180 quoted embedded newlines in CSV cells")
    p.add_argument("--master", default=None)
    args = p.parse_args()

    from pii_detection_redaction_spark.plans.session import build_session
    from pii_detection_redaction_spark.sources.batch import batch_redact

    spark = build_session(app_name="pii-batch-redact", master=args.master)
    manifest = batch_redact(
        spark,
        args.input,
        args.output,
        delimiter=args.delimiter,
        header=not args.no_header,
        use_entity_labels=args.labels,
        min_score=args.min_score,
        entities=args.entities,
        scrub_mode=args.scrub_mode,
        save_json=not args.no_json,
        multiline=args.multiline,
        zip_name=args.zip_name,
    )
    print(json.dumps(manifest, sort_keys=True))
    spark.stop()


if __name__ == "__main__":
    main()
