#!/usr/bin/env python
"""spark-submit entry point for END-TO-END training-corpus preparation:
quality filter + PII scrub -> exact dedup -> MinHash near-dedup ->
exact-substring dedup -> optional token-budget mixture sample ->
token-shard packing.

    spark-submit --py-files pii_spark.zip jobs/run_prepare.py \
        --input s3://bucket/pages/ --output s3://bucket/prepared/ \
        --budget en=2000000000 --budget fr=500000000

Local smoke:

    python jobs/run_prepare.py --input _data/pages_sf0.001.parquet \
        --output _data/prepared
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="pages parquet (url, html|text, ...)")
    p.add_argument("--format", default="parquet", choices=("parquet", "warc", "jsonl"),
                   help="input format: parquet pages table, .warc(.gz) dir, or .jsonl(.gz) dir")
    p.add_argument("--output", required=True, help="output root (stage dirs inside)")
    p.add_argument("--budget", action="append", default=[],
                   metavar="LANG=TOKENS",
                   help="token budget per predicted language (repeatable)."
                        " When any budget is given, unbudgeted languages are"
                        " DROPPED (a mixture spec names what goes in).")
    p.add_argument("--shard-tokens", type=int, default=None,
                   help="tokens per output shard (default: packing spec)")
    p.add_argument("--near-threshold", type=float, default=0.8,
                   help="k-gram Jaccard threshold for near-dedup")
    p.add_argument("--exsub-k", type=int, default=None,
                   help="exact-substring window length in tokens")
    p.add_argument("--output-format", default="parquet",
                   choices=("parquet", "jsonl"),
                   help="final-table format (jsonl = gzip text dump)")
    p.add_argument("--quality-threshold", type=float, default=None,
                   help="drop rule-kept docs whose classifier quality_prob"
                        " is below this (model gate on top of the rules)")
    p.add_argument("--strip-boilerplate", action="store_true",
                   help="CC-Net corpus-level line dedup before the rules")
    p.add_argument("--quality-model", default=None, metavar="NPZ",
                   help="score quality_prob with a run_train.py 'quality' "
                        ".npz artifact instead of the embedded seed model")
    p.add_argument("--decontam", default=None, metavar="PARQUET",
                   help="eval-set parquet: drop prepared docs sharing any "
                        "word n-gram with it (test-set decontamination)")
    p.add_argument("--decontam-text-col", default="text",
                   help="text column in the --decontam parquet")
    p.add_argument("--master", default=None)
    args = p.parse_args()

    budgets = {}
    for spec in args.budget:
        lang, _, n = spec.partition("=")
        if not n.isdigit():
            p.error(f"--budget wants LANG=TOKENS, got {spec!r}")
        budgets[lang] = int(n)

    from pii_detection_redaction_spark.operators.packing import SHARD_TOKENS
    from pii_detection_redaction_spark.plans.pipeline import PipelineConfig
    from pii_detection_redaction_spark.plans.prepare import prepare_corpus
    from pii_detection_redaction_spark.plans.session import build_session

    spark = build_session(app_name="pii-prepare-corpus", master=args.master)
    cfg = PipelineConfig(
        strip_boilerplate=args.strip_boilerplate,
        quality_model=args.quality_model,
    )
    counters = prepare_corpus(
        spark,
        args.input,
        args.output,
        cfg=cfg,
        budgets=budgets or None,
        shard_tokens=args.shard_tokens or SHARD_TOKENS,
        near_threshold=args.near_threshold,
        exsub_k=args.exsub_k,
        input_format=args.format,
        output_format=args.output_format,
        quality_threshold=args.quality_threshold,
        decontam_path=args.decontam,
        decontam_text_col=args.decontam_text_col,
    )
    print(json.dumps(counters))
    spark.stop()


if __name__ == "__main__":
    main()
