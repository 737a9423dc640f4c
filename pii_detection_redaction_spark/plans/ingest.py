"""Incremental ingestion — add a new crawl batch to an ALREADY-PREPARED
corpus without reprocessing history.

The production cadence for a web corpus is a daily/weekly increment: run
the quality+scrub pipeline on the new pages only, then admit just the docs
the corpus has never seen. "Seen" is tested at two levels:

1. URL level — canonical URL (core.urlnorm) against the set of URLs EVER
   PROCESSED (the scrub snapshot stores of the base corpus and every prior
   increment — not just the retained final table: a page that was
   quality-dropped or deduped away before must not be re-admitted when
   re-crawled). Bloom-gated (``operators.dedup.incremental_new``): the
   typical increment is mostly genuinely-new URLs, and those skip the
   verify join entirely; only the maybe-seen sliver (true re-crawls + the
   small FP tail) is verified exactly.
2. Content level — md5 of the scrubbed text against the same
   processed-ever registry (PRE-exsub text on both sides, like-for-like:
   hashing against the excised retained copies would re-admit moved-URL
   re-crawls of exsub-touched docs). Anti-join on the 32-byte hash;
   neither side's text payload moves.

New docs are exact-deduped and exact-substring-excised WITHIN the
increment and written under
``<corpus_root>/increments/<name>/final`` as their own token shards —
appending into history's shard files would break their packing invariant;
a training reader unions ``final`` with ``increments/*/final``. Cross-batch
NEAR-dup removal against all of history is deliberately out of scope here
(it is a full near_dedup_pass over the union — run that as a periodic
compaction instead; this job keeps increment cost proportional to the
increment).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import dedup_exact, incremental_new
from ..operators.packing import SHARD_TOKENS
from ..operators.textstats import TOKEN_RE
from ..operators.web import canonical_url_col
from .dedup_pass import near_dedup_df
from .pipeline import PipelineConfig, read_output, run_pipeline
from .prepare import decontaminate_against, pack_and_write


def _increment_paths(
    spark: SparkSession, corpus_root: str, subdir: str, exclude: str = ""
) -> list:
    """``<corpus_root>/<subdir>`` plus every
    ``<corpus_root>/increments/<name>/<subdir>`` (minus ``exclude``),
    listed through the Hadoop FileSystem API — NOT a local glob, so the
    documented object-store roots (s3://, hdfs://) enumerate correctly
    instead of silently returning nothing and shrinking the registries /
    dropping increments from compaction."""
    jvm = spark._jvm
    base = f"{corpus_root}/{subdir}"
    pattern = jvm.org.apache.hadoop.fs.Path(
        f"{corpus_root}/increments/*/{subdir}"
    )
    fs = pattern.getFileSystem(spark._jsc.hadoopConfiguration())
    paths = [base]
    for status in sorted(
        fs.globStatus(pattern) or [], key=lambda s: str(s.getPath())
    ):
        p = status.getPath()
        if p.getParent().getName() != exclude:
            sp = str(p)
            if sp.startswith("file:"):
                # plain local path for the snapshot store's os-level reads
                sp = p.toUri().getPath()
            paths.append(sp)
    return paths


def ingest_increment(
    spark: SparkSession,
    new_pages_path: str,
    corpus_root: str,
    name: str,
    cfg: Optional[PipelineConfig] = None,
    input_format: str = "parquet",
    shard_tokens: int = SHARD_TOKENS,
    decontam_path: Optional[str] = None,
    decontam_text_col: str = "text",
) -> Dict[str, int]:
    inc_root = os.path.join(corpus_root, "increments", name)

    # 1) quality + scrub the increment only (own resumable snapshot store)
    c = dict(
        run_pipeline(
            spark,
            new_pages_path,
            os.path.join(inc_root, "scrub"),
            cfg or PipelineConfig(),
            input_format=input_format,
        )
    )
    kept = read_output(spark, os.path.join(inc_root, "scrub")).filter(F.col("keep"))
    n_kept = kept.count()

    # the processed-ever registry: (url, scrubbed_text) of every doc the
    # base corpus and prior increments SCRUBBED — kept, dropped, or deduped
    # away. The content hashes deliberately come from here (PRE-exsub text)
    # and not from the retained finals: the batch's scrubbed_text is also
    # pre-exsub, so the comparison is like-for-like — hashing against the
    # excised retained copy would silently re-admit a moved-URL re-crawl of
    # any document exsub touched.
    reg = None
    for root in _increment_paths(spark, corpus_root, "scrub", exclude=name):
        part = read_output(spark, root).select("url", "scrubbed_text")
        reg = part if reg is None else reg.unionByName(part)

    # 2) URL-level admission (Bloom-gated exact verdict)
    hist_keys = reg.select(canonical_url_col().alias("__key"))
    batch = kept.withColumn("__key", canonical_url_col())
    new = (
        incremental_new(batch, hist_keys, key_col="__key")
        .filter(F.col("is_new"))
        .drop("__key", "bloom_maybe", "is_new")
    )
    n_new_url = new.count()

    # 3) content-level admission (page moved to a new URL unchanged);
    # persist: the admission chain (Bloom UDF + two joins) feeds this
    # count, both dedup stages, and the write — without it the chain
    # re-runs for every downstream action
    hist_md5 = reg.select(F.md5("scrubbed_text").alias("__md5")).distinct()
    new = (
        new.withColumn("__md5", F.md5("scrubbed_text"))
        .join(hist_md5, "__md5", "left_anti")
        .drop("__md5")
        .persist()
    )
    n_new = new.count()

    # 4) the same per-batch hygiene prepare applies, in the same order —
    # exact dedup, near-dedup, THEN exact-substring excision (near-dedup
    # must collapse whole-document twins first: running exsub on a
    # near-dup pair would gut the loser instead of deleting it) — all
    # WITHIN the increment; cross-batch clusters are the compaction pass's
    # job
    from ..operators.exsub import exsub_dedup

    final_inc = dedup_exact(new, id_col="url", text_col="scrubbed_text")
    n_exact = final_inc.count()
    final_inc, _ = near_dedup_df(final_inc, id_col="url",
                                 text_col="scrubbed_text")
    n_near = final_inc.count()
    final_inc = (
        exsub_dedup(final_inc, id_col="url", text_col="scrubbed_text")
        .withColumn("scrubbed_text", F.col("clean_text"))
        .drop("clean_text")
    )
    # 4b) optional test-set decontamination of the increment (shared stage
    # helper — same position and plan shape as prepare_corpus; without it a
    # contaminated page could enter a decontaminated corpus via ingest)
    n_decontam_base = n_near
    if decontam_path is not None:
        final_inc = decontaminate_against(
            spark, final_inc, decontam_path, decontam_text_col
        )
        n_decontam_base = final_inc.count()
    final_inc = final_inc.withColumn(
        "n_tokens", F.regexp_count(F.col("scrubbed_text"), F.lit(TOKEN_RE))
    )
    # shared packing tail (prepare_corpus's pack_and_write: persist once,
    # token-shard assignment, co-filed write, parquet read-back)
    out_path = os.path.join(inc_root, "final")
    n_final = pack_and_write(
        spark, final_inc, out_path, shard_tokens
    ).count()
    new.unpersist()
    c.update(
        {
            "docs_kept": n_kept,
            "url_dups_skipped": n_kept - n_new_url,
            "content_dups_skipped": n_new_url - n_new,
            "increment_exact_dups_removed": n_new - n_exact,
            "increment_near_dups_removed": n_exact - n_near,
            "decontaminated_out": n_near - n_decontam_base,
            "docs_ingested": n_final,
        }
    )
    return c


def compact_corpus(
    spark: SparkSession,
    corpus_root: str,
    name: str = "compact",
    near_threshold: float = 0.8,
    shard_tokens: int = SHARD_TOKENS,
) -> Dict[str, int]:
    """Periodic maintenance pass: near-dedup ACROSS the base corpus and all
    increments (the cross-batch clusters ``ingest_increment`` deliberately
    leaves — its cost stays proportional to the increment; this job is the
    amortized corpus-wide sweep), THEN corpus-wide exact-substring excision
    (per-batch exsub cannot see a >=K-token run shared by two batches'
    docs when the pair is below the near-dup threshold — e.g. two long,
    mostly-different pages sharing one boilerplate sentence — so each
    batch keeps its own 'keeper' occurrence until this pass), then re-shard
    and write a fresh corpus under ``<corpus_root>/compacted/<name>/final``.
    Non-destructive: the caller swaps roots when satisfied.
    """
    paths = _increment_paths(spark, corpus_root, "final")
    union = None
    for p in paths:
        part = spark.read.parquet(p)
        union = part if union is None else union.unionByName(
            part, allowMissingColumns=True
        )
    n_in = union.count()
    d, cc_rounds = near_dedup_df(
        union, id_col="url", text_col="scrubbed_text", threshold=near_threshold
    )
    # corpus-wide exsub over the survivors (drop the per-batch exsub audit
    # columns first — this pass supersedes them)
    from ..operators.exsub import exsub_dedup

    d = d.drop("start_offset", "shard_id", "n_tokens",
               "n_chars_removed", "n_dup_windows")
    d = (
        exsub_dedup(d, id_col="url", text_col="scrubbed_text")
        .withColumn("scrubbed_text", F.col("clean_text"))
        .drop("clean_text")
        .withColumn(
            "n_tokens", F.regexp_count(F.col("scrubbed_text"), F.lit(TOKEN_RE))
        )
    )
    # fresh global shard packing (per-batch shard ids are meaningless after
    # the merge) via the shared tail helper
    out_path = os.path.join(corpus_root, "compacted", name, "final")
    out = pack_and_write(spark, d, out_path, shard_tokens)
    agg = out.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_tokens").alias("tokens"),
        F.countDistinct("shard_id").alias("shards"),
        F.sum("n_chars_removed").alias("exsub_chars"),
    ).collect()[0]
    return {
        "docs_in": n_in,
        "cross_near_dups_removed": n_in - agg["docs"],
        "cc_rounds": cc_rounds,
        "cross_exsub_chars_removed": int(agg["exsub_chars"] or 0),
        "docs_out": agg["docs"],
        "total_tokens": int(agg["tokens"] or 0),
        "n_shards": agg["shards"],
    }
