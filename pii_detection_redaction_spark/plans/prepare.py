"""End-to-end training-corpus preparation — the whole engine in one job.

The FineWeb/RefinedWeb-shaped flow a user actually runs, chained from the
operators this repo already value-gates individually:

    raw pages ──(1)── quality filter + PII/toxicity scrub  (plans.pipeline,
                      snapshot store: crash-safe, resumable)
          ────(2)── exact dedup            (operators.dedup.dedup_exact)
          ────(3)── MinHash near-dedup     (plans.dedup_pass.near_dedup_df)
          ────(4)── exact-substring dedup  (operators.exsub, in-place excise)
          ────(5)── token-budget mixture sample  (operators.sampling;
                      optional — budgets name what goes in, by lang_pred)
          ────(6)── token-shard packing    (operators.packing) and write,
                      repartitioned by shard so a shard's docs are co-filed.

Materialization points: ``<out_root>/scrub/`` (snapshot store, stage 1),
``<out_root>/deduped/`` (after near-dedup — the dedup chain never
recomputes under downstream actions), ``<out_root>/final[_jsonl]/``.
Counters for every stage come back in one dict (the JSON line
``jobs/run_prepare.py`` prints). Stages 2-6 are deterministic pure
functions of their input; stage 1 inherits the snapshot store's resume
semantics.
"""

from __future__ import annotations

import os
from dataclasses import replace
from typing import Dict, Mapping, Optional

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..operators.exsub import exsub_dedup
from ..operators.packing import SHARD_TOKENS, token_shards
from ..operators.sampling import token_budget_sample
from ..operators.textstats import TOKEN_RE
from .dedup_pass import near_dedup_df
from .pipeline import PipelineConfig, read_output, run_pipeline


def decontaminate_against(
    spark: SparkSession,
    d,
    decontam_path: str,
    decontam_text_col: str,
    id_col: str = "url",
    text_col: str = "scrubbed_text",
):
    """Shared decontamination stage (prepare_corpus AND ingest_increment —
    one spelling, so a fix lands in both): drop documents sharing any word
    n-gram with the eval set. flag_contaminated broadcasts the eval gram
    set (the corpus side never shuffles); the removal anti-joins against
    only the CONTAMINATED id set, which is eval-sized and broadcastable —
    the 10^12-doc side moves nowhere."""
    from ..operators.decontam import flag_contaminated

    eval_df = spark.read.parquet(decontam_path).select(
        F.col(decontam_text_col).alias(text_col)
    )
    flags = flag_contaminated(d, eval_df, id_col=id_col, text_col=text_col)
    bad = flags.filter(F.col("contaminated")).select(id_col)
    return d.join(F.broadcast(bad), id_col, "left_anti")


def pack_and_write(spark: SparkSession, d, final_path: str,
                   shard_tokens: int = SHARD_TOKENS):
    """Shared packing tail (prepare_corpus AND ingest_increment): persist
    (token_shards' bucket totals, both join sides, and the write all walk
    the upstream chain — without it the window UDFs re-run ~3-4x) →
    token-shard assignment → shard join → co-filed write (repartitioned by
    shard so a shard's docs are co-filed) → parquet read-back for
    downstream counts/exports. ``d`` must carry url + n_tokens."""
    d = d.persist()
    shards = token_shards(d, id_col="url", tokens_col="n_tokens",
                          shard_tokens=shard_tokens)
    final = d.drop("n_tokens").join(shards, "url")
    final.repartition(F.col("shard_id")).write.mode("overwrite").parquet(
        final_path
    )
    d.unpersist()
    return spark.read.parquet(final_path)


def prepare_corpus(
    spark: SparkSession,
    input_path: str,
    out_root: str,
    cfg: Optional[PipelineConfig] = None,
    budgets: Optional[Mapping[str, int]] = None,
    shard_tokens: int = SHARD_TOKENS,
    near_threshold: float = 0.8,
    exsub_k: Optional[int] = None,
    input_format: str = "parquet",
    output_format: str = "parquet",
    quality_threshold: Optional[float] = None,
    decontam_path: Optional[str] = None,
    decontam_text_col: str = "text",
) -> Dict[str, int]:
    from ..core.exsub import EXSUB_K

    k = EXSUB_K if exsub_k is None else exsub_k
    scrub_root = os.path.join(out_root, "scrub")
    final_path = os.path.join(out_root, "final")

    # 1) quality filter + scrub (snapshot store — resumable)
    cfg = cfg or PipelineConfig()
    if quality_threshold is not None and not cfg.quality_classifier:
        cfg = replace(cfg, quality_classifier=True)
    # resume guard — checked BEFORE run_pipeline appends new groups: if a
    # prior run committed groups WITHOUT quality_prob, resuming with the
    # classifier on would mix schemas (the old groups' rows read
    # quality_prob=NULL and the threshold filter silently drops them all).
    # Checking after the run would miss exactly the crashed-midway case,
    # because Spark may sample a NEW group's footer for the union schema.
    if quality_threshold is not None:
        from ..sources.snapshots import SnapshotStore

        prior = SnapshotStore(scrub_root).data_paths()
        # per-group schema check: a union-level .columns can sample any one
        # footer, which would hide a mixed store
        stale = [
            p for p in prior
            if "quality_prob" not in spark.read.parquet(p).columns
        ]
        if stale:
            raise ValueError(
                f"quality_threshold set but committed snapshot groups "
                f"{stale} under {scrub_root!r} carry no quality_prob column "
                f"(they were written with quality_classifier=False); re-run "
                f"with a fresh out_root or delete the stale snapshots"
            )
    c = dict(run_pipeline(spark, input_path, scrub_root, cfg,
                          input_format=input_format))
    kept = read_output(spark, scrub_root).filter(F.col("keep"))

    # 1b) optional model gate ON TOP of the frozen rule keep/drop: drop kept
    # docs the fastText-architecture classifier scores under the threshold
    # (DCLM/FineWeb pattern — rules recall, model precision)
    if quality_threshold is not None:
        n_rule_kept = kept.count()
        kept = kept.filter(F.col("quality_prob") >= quality_threshold)
        n_kept = kept.count()  # counted ONCE — reused below
        c["model_gated_out"] = n_rule_kept - n_kept
    else:
        n_kept = kept.count()

    # 2) exact dedup: keeper = lexicographically smallest url per content
    from ..operators.dedup import dedup_exact
    d = dedup_exact(kept, id_col="url", text_col="scrubbed_text")
    n_exact = d.count()

    # 3) near dedup (MinHash-LSH → verify → connected components),
    # MATERIALIZED: the dedup chain (signatures, band join, CC) must not
    # recompute under every downstream count/action, and the written
    # parquet is the stage-3 resume point a 100-TB run needs
    d, cc_rounds = near_dedup_df(
        d, id_col="url", text_col="scrubbed_text", threshold=near_threshold
    )
    dedup_path = os.path.join(out_root, "deduped")
    d.write.mode("overwrite").parquet(dedup_path)
    d = spark.read.parquet(dedup_path)
    n_near = d.count()

    # 4) exact-substring dedup: excise non-keeper >=K-token repeated runs
    d = exsub_dedup(d, id_col="url", text_col="scrubbed_text", k=k)
    d = (
        d.withColumn("scrubbed_text", F.col("clean_text"))
        .drop("clean_text")
        .withColumn(
            "n_tokens", F.regexp_count(F.col("scrubbed_text"), F.lit(TOKEN_RE))
        )
    )

    # 4b) optional test-set decontamination (after dedup/exsub, before
    # sampling — the canonical pipeline position); shared stage helper
    n_decontam_base = n_near
    decontam_removed = 0
    if decontam_path is not None:
        d = decontaminate_against(spark, d, decontam_path, decontam_text_col)
        n_decontam_base = d.count()
        decontam_removed = n_near - n_decontam_base

    # 5) optional mixture sampling on the predicted language
    if budgets:
        d = token_budget_sample(d, "url", "lang_pred", "n_tokens", budgets)

    # 6) shard assignment + co-filed write (shared tail: pack_and_write);
    # parquet, or additionally gzip JSONL for trainers that consume text
    # dumps — detections ride as JSON structs.
    if output_format not in ("parquet", "jsonl"):
        raise ValueError(f"unknown output_format {output_format!r}")
    # The parquet final/ is ALWAYS written — the ingest/compact registry
    # enumerates <root>/final and increments/*/final, so a jsonl-only
    # corpus would silently contribute nothing to compaction.
    out = pack_and_write(spark, d, final_path, shard_tokens)
    if output_format == "jsonl":
        # gzip JSONL for trainers that consume text dumps, derived from the
        # parquet read-back: a second independent action over the
        # unpersisted `final` would run token_shards' windows and the shard
        # join twice.
        jsonl_path = os.path.join(out_root, "final_jsonl")
        out.repartition(F.col("shard_id")).write.mode("overwrite").option(
            "compression", "gzip"
        ).json(jsonl_path)

    agg = out.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_tokens").alias("tokens"),
        F.countDistinct("shard_id").alias("shards"),
        F.sum("n_chars_removed").alias("exsub_chars"),
    ).collect()[0]
    c.update(
        {
            "docs_kept": n_kept,
            "exact_dups_removed": n_kept - n_exact,
            "near_dups_removed": n_exact - n_near,
            "cc_rounds": cc_rounds,
            "decontaminated_out": decontam_removed,
            "docs_final": agg["docs"],
            "docs_sampled_out": n_decontam_base - agg["docs"],
            "exsub_chars_removed": int(agg["exsub_chars"] or 0),
            "total_tokens": int(agg["tokens"] or 0),
            "n_shards": agg["shards"],
        }
    )
    return c
