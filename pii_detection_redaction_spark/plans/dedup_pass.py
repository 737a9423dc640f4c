"""Corpus-level dedup pass over committed pipeline output.

Exact dedup cannot live inside the scrub pipeline's bucket-group commits:
content duplicates land in different url-hash buckets (same text, different
url), and groups commit independently for resume. The production shape is a
second pass over the committed table — one shuffle keyed by the content
hash (uniform by construction), which is also how this composes on a
cluster: scrub job → dedup job, each independently resumable.

Reuses ``operators.dedup.dedup_exact`` (groupBy + min + semi-join: the heavy
payload columns never enter the aggregation, only (url, hash) do) and
optionally reports MinHash-LSH near-dup candidate pairs for audit.
"""

from __future__ import annotations

from typing import Dict, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    dedup_exact,
    exact_duplicates,
    jaccard_verify_pairs,
    minhash_candidate_pairs,
)
from ..operators.graph import connected_components_with_rounds
from .pipeline import read_output


def dedup_pass(
    spark: SparkSession,
    pipeline_out_root: str,
    dest: str,
    text_col: str = "scrubbed_text",
) -> Dict[str, int]:
    """Read kept docs from the snapshot store, drop exact duplicates of
    ``text_col`` (keeper = lexicographically smallest url), write the final
    table to ``dest``. Returns counters."""
    kept = read_output(spark, pipeline_out_root).filter(F.col("keep"))
    # count BEFORE the write: the snapshot store accepts commits from a
    # concurrently-resuming scrub job, so re-scanning it afterwards could
    # inflate docs_in with docs the dedup never saw (phantom 'removals')
    n_in = kept.count()
    deduped = dedup_exact(kept, id_col="url", text_col=text_col)
    deduped.write.mode("overwrite").parquet(dest)
    n_out = spark.read.parquet(dest).count()
    return {
        "docs_in": n_in,
        "docs_out": n_out,
        "exact_dups_removed": n_in - n_out,
    }


def near_dedup_df(
    df,
    id_col: str = "url",
    text_col: str = "scrubbed_text",
    threshold: float = 0.8,
    num_hashes: int = 16,
    band_size: int = 4,
):
    """DataFrame form of the near-dup removal (candidates → Jaccard verify
    → connected components → keep smallest id per cluster); returns
    (survivors, cc_rounds). ``near_dedup_pass`` wraps it for the snapshot
    store; ``plans.prepare`` chains it after exact dedup."""
    hashable = df.filter(F.regexp_count(F.col(text_col), F.lit(r"\S")) > 0)
    cand = minhash_candidate_pairs(
        hashable, id_col=id_col, text_col=text_col,
        num_hashes=num_hashes, band_size=band_size,
    )
    verified = jaccard_verify_pairs(
        hashable, cand, id_col=id_col, text_col=text_col, threshold=threshold
    )
    comps, cc_rounds = connected_components_with_rounds(
        verified.select("id_a", "id_b")
    )
    losers = comps.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti"), cc_rounds


def near_dedup_pass(
    spark: SparkSession,
    pipeline_out_root: str,
    dest: str,
    threshold: float = 0.8,
    text_col: str = "scrubbed_text",
    num_hashes: int = 16,
    band_size: int = 4,
) -> Dict[str, int]:
    """MinHash-LSH near-dup removal with transitive clustering:

    candidates (band self-join, text never shuffles) → exact k-gram Jaccard
    verify (>= threshold) → connected components over the verified pair graph
    (A~B, B~C collapse to one cluster) → keep the smallest url per cluster.

    Zero-content docs never enter the LSH stage: every shingle-less doc
    shares the identical all-sentinel MinHash signature (core.hashing
    precondition) — unguarded, N empty kept docs would become N(N-1)/2
    verified 'pairs' (quadratic equal-key band skew) and all but one would
    be deleted despite sharing no content. They pass through to the output
    untouched.
    """
    kept = read_output(spark, pipeline_out_root).filter(F.col("keep"))
    n_in = kept.count()  # before the write — see dedup_pass counter note
    final, cc_rounds = near_dedup_df(
        kept, id_col="url", text_col=text_col, threshold=threshold,
        num_hashes=num_hashes, band_size=band_size,
    )
    final.write.mode("overwrite").parquet(dest)
    n_out = spark.read.parquet(dest).count()
    return {
        "docs_in": n_in,
        "docs_out": n_out,
        "near_dups_removed": n_in - n_out,
        "cc_rounds": cc_rounds,
    }


def duplicate_report(
    spark: SparkSession, pipeline_out_root: str, text_col: str = "scrubbed_text"
) -> DataFrame:
    """Audit table of duplicate groups: (content_md5, n_docs, keeper_id)."""
    kept = read_output(spark, pipeline_out_root).filter(F.col("keep"))
    return exact_duplicates(kept, id_col="url", text_col=text_col)
