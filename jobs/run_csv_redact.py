#!/usr/bin/env python
"""spark-submit entry point for cell-wise CSV redaction — the distributed
analog of the reference's ``python -m csv_redactor.cli`` (entry point C,
SURVEY.md §3.3): analyze every cell, redact detected spans (mask or entity
labels), write the redacted CSV + long-format detections + per-entity
summary.

    spark-submit --py-files pii_spark.zip jobs/run_csv_redact.py \
        --input data.csv --output out/ [--labels] [--delimiter ';'] \
        [--min-score 0.3] [--entities EMAIL_ADDRESS AU_TFN]

Local smoke:

    python jobs/run_csv_redact.py --input /tmp/in.csv --output /tmp/red
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="CSV file/dir")
    p.add_argument("--output", required=True,
                   help="output dir (redacted/, detections/, summary printed)")
    p.add_argument("--delimiter", default=",")
    p.add_argument("--no-header", action="store_true")
    p.add_argument("--multiline", action="store_true",
                   help="RFC-4180 quoted embedded newlines (one scan "
                        "partition per file — use for UI-parity inputs)")
    p.add_argument("--labels", action="store_true",
                   help="replace with <ENTITY_TYPE> labels instead of '*' mask")
    p.add_argument("--min-score", type=float, default=0.0)
    p.add_argument("--entities", nargs="*", default=None)
    p.add_argument("--master", default=None)
    args = p.parse_args()

    from pii_detection_redaction_spark.plans.session import build_session
    from pii_detection_redaction_spark.sources.csv import (
        detections_to_json,
        read_csv,
        redact_csv,
        write_csv,
    )

    spark = build_session(app_name="pii-csv-redact", master=args.master)
    df = read_csv(spark, args.input, delimiter=args.delimiter,
                  header=not args.no_header, multiline=args.multiline)
    out = redact_csv(df, use_entity_labels=args.labels,
                     min_score=args.min_score, entities=args.entities,
                     cache=True,  # three sinks share the detection pass
                     # reference JSON export shape carries cell_value
                     # (csv_redactor/formatter.py) — same as batch_redact
                     include_cell_value=True)
    write_csv(out["redacted"], os.path.join(args.output, "redacted"),
              delimiter=args.delimiter, header=not args.no_header)
    detections_to_json(out["detections"], source=df).write.mode(
        "overwrite"
    ).text(os.path.join(args.output, "detections"))
    summary = {
        r["entity_type"]: {"n_detections": r["n_detections"], "n_cells": r["n_cells"]}
        for r in out["summary"].collect()
    }
    print(json.dumps({"summary": summary}))
    spark.stop()


if __name__ == "__main__":
    main()
