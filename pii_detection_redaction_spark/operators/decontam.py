"""Test-set decontamination: flag training documents that share a word
n-gram with the evaluation set (spec: ``core.decontam``).

Scale design — the asymmetry is the whole point: the corpus is 10^12
documents, the eval side is benchmark suites (at most a few hundred MB of
distinct n-grams). So:

- n-gram generation is a JVM higher-order expression (split / transform /
  slice / array_join) — no Python, no UDF;
- the eval n-gram set is ``collect``-free: it stays a DataFrame and is
  BROADCAST to the probe side, so the corpus never shuffles — each corpus
  partition streams its grams through a hash probe;
- per-document dedup (``array_distinct``) happens BEFORE the explode, so a
  document repeating one contaminated gram 1000 times probes it once;
- output preserves every non-eval document (left join back), because the
  downstream filter wants an explicit contaminated=false, not an absence.

If the eval set ever outgrows broadcast range, swap the broadcast for a
shuffle semi-join on the gram hash — same plan shape as the MinHash band
join; the operator's seam is the ``eval_grams`` DataFrame, not the strategy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..core import casefold as CF
from ..core import decontam as C


def tokens_col(text_col: Column) -> Column:
    """Lowercased alphanumeric word tokens (spec tokenization). translate
    İ→i before lower: JVM lower expands U+0130 to i+U+0307 (which this
    ASCII split would cut at) while DuckDB lowers it to plain i — the
    one-char rule of ``core.casefold`` keeps all three engines' tokens
    identical. İ is the ONLY casefold pin this tokenizer needs: for the
    spec's 70 identity-pinned late-Unicode capitals, both the char and
    every engine's lowering of it are non-[a-z0-9] — a separator either
    way, so token streams agree without the full ``simple_lower_col``
    machinery."""
    return F.filter(
        F.split(F.lower(F.translate(text_col, CF.I_DOT, "i")), C.TOKEN_SPLIT_RE),
        lambda x: x != "",
    )


def ngrams_col(text_col: Column, n: int = C.NGRAM_N) -> Column:
    """All n-word shingles joined by spaces; [] when the doc is shorter than
    n words (guarded — Spark's sequence(1, 0) would count DOWN)."""
    toks = tokens_col(text_col)
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def eval_ticket_col(id_col: Column) -> Column:
    """Deterministic eval-slice membership (the repo-wide salted-hash
    ticket, spelled once in operators.sampling)."""
    from .sampling import sample_hash_col

    return sample_hash_col(id_col, salt=C.EVAL_SALT) < C.EVAL_THRESHOLD


def flag_contaminated(
    corpus: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = C.NGRAM_N,
    strategy: str = "broadcast",
) -> DataFrame:
    """(id, n_shared_grams, contaminated) for every corpus row: how many
    DISTINCT n-grams of the document appear anywhere in ``eval_df``.

    ``strategy='broadcast'`` (default) ships the eval gram set to every
    executor — correct whenever the eval side is benchmark-sized. If the
    eval set is itself corpus-scale (cross-deduplication against another
    crawl), use ``strategy='shuffle'``: a plain shuffle semi-join on the
    gram — both sides move (gram, id) projections only, never documents,
    and hot boilerplate grams lean on AQE skew-split like the MinHash band
    join. Results are identical (equality test-pinned)."""
    eval_grams = (
        eval_df.select(F.explode(ngrams_col(F.col(text_col), n)).alias("g"))
        .distinct()
    )
    probes = corpus.select(
        F.col(id_col),
        F.explode(F.array_distinct(ngrams_col(F.col(text_col), n))).alias("g"),
    )
    if strategy not in ("broadcast", "shuffle"):
        raise ValueError(f"unknown strategy {strategy!r}")
    if strategy == "broadcast":
        eval_grams = F.broadcast(eval_grams)
    hits = (
        probes.join(eval_grams, "g", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared_grams"))
    )
    return (
        corpus.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_shared_grams", F.lit(0)).cast("long").alias(
                "n_shared_grams"
            ),
            (F.coalesce("n_shared_grams", F.lit(0)) > 0).alias("contaminated"),
        )
    )
