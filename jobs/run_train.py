#!/usr/bin/env python
"""spark-submit entry point for distributed model training: fit the quality
classifier, the language-ID classifier, or the per-language perplexity LMs
from a parquet of labeled seed documents and write a ``.npz`` artifact that
the scoring UDFs accept (``make_ftquality_udf(W=...)``, ``predict(...)``,
``perplexity`` via ``CharTrigramLM``).

    spark-submit --py-files pii_spark.zip jobs/run_train.py \
        --task quality --input s3://bucket/seed_labeled/ \
        --output /models/quality_v2.npz

Local smoke:

    python jobs/run_train.py --task lm --input _data/seed.parquet \
        --lang-col lang --output /tmp/lms.npz
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> dict:
    p = argparse.ArgumentParser()
    p.add_argument("--task", required=True, choices=("quality", "langid", "lm"))
    p.add_argument("--input", required=True, help="parquet of seed documents")
    p.add_argument("--output", required=True, help=".npz model artifact path")
    p.add_argument("--text-col", default="text")
    p.add_argument("--label-col", default="label",
                   help="quality task: int column, 0=junk 1=good")
    p.add_argument("--lang-col", default="lang",
                   help="langid task: language label; lm task: optional"
                        " grouping column ('' trains one model)")
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)

    from pii_detection_redaction_spark.operators import train as T
    from pii_detection_redaction_spark.plans.session import build_session

    from pyspark.sql import functions as F

    spark = build_session(app_name=f"pii-train-{args.task}", master=args.master)
    df = spark.read.parquet(args.input)
    # count() over a bare parquet scan is metadata-cheap (zero-column scan,
    # row counts come from footer statistics) — it does not re-read the
    # text payload the trainers scan below
    summary = {"task": args.task, "rows": df.count()}
    if args.task == "quality":
        W = T.train_quality_classifier(df, args.text_col, args.label_col)
        summary["output"] = T.save_quality_model(args.output, W)
        summary["nonzero_buckets"] = int((W != 0.0).any(axis=1).sum())
    elif args.task == "langid":
        # a NULL lang label would become a None class: training tolerates it
        # but the saved langs array turns object-dtype and load_model
        # (allow_pickle=False) rejects the artifact — exclude nulls up front
        langs = tuple(
            r[0]
            for r in df.filter(F.col(args.lang_col).isNotNull())
            .select(args.lang_col)
            .distinct()
            .orderBy(args.lang_col)
            .collect()
        )
        if not langs:
            raise ValueError(f"no non-null values in column {args.lang_col!r}")
        W, langs = T.train_langid_classifier(
            df.filter(F.col(args.lang_col).isNotNull()),
            args.text_col,
            args.lang_col,
            langs,
        )
        summary["output"] = T.save_langid_model(args.output, W, langs)
        summary["langs"] = list(langs)
        summary["nonzero_buckets"] = int((W != 0.0).any(axis=1).sum())
    else:
        lang_col = args.lang_col or None
        models = T.train_char_lms(df, args.text_col, lang_col)
        summary["output"] = T.save_lm_models(args.output, models)
        summary["models"] = {
            lang: {"total_chars": m.total, "trigram_vocab": int(len(m.tri_keys))}
            for lang, m in sorted(models.items())
        }
    print(json.dumps(summary))
    spark.stop()
    return summary


if __name__ == "__main__":
    main()
