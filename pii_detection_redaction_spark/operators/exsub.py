"""Exact-substring dedup (ExactSubstr, Lee et al. 2021) as a Spark plan.

Spec and pure-Python reference: ``core.exsub``. Plan shape, stage by stage:

1. window table — one Arrow-batched UDF pass per doc emits its K-token
   window (key, start, end) entries; exploding is row-local. This is the
   corpus's token stream re-keyed: ~n_tokens rows, but only 20 bytes each
   (the text itself never enters the window table).
2. duplicate keys — groupBy(key) with COUNT + MIN(struct(doc_id, start)):
   both partially aggregable, so the heavy shuffle moves one partial row
   per (map task, hot key) for repeated content; kept only where count>1.
   The min-struct IS the keeper rule (lexicographic (doc_id,start)).
3. marked occurrences — the window table re-derived (recompute beats
   materializing a corpus-sized intermediate) joins the duplicate keys on
   key (AQE handles boilerplate hot keys), keeper occurrence filtered out.
4. per-doc excision — marked spans groupBy(doc_id) into an array (bounded
   by the doc's own window count), broadcast-...no: payload joins spans
   LEFT on doc_id — the document text moves through exactly ONE shuffle —
   and a second Arrow UDF merges + excises spans (core.exsub.merge/excise).

At 100 TB the window-key shuffle is the dominant cost — same asymptotics as
the paper's suffix array, but partial-agg'd, AQE-balanced, and restartable;
docs with no duplicated window pass the left join untouched.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.pandas.functions import pandas_udf

from ..core import exsub as X

_WINDOW_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("key", T.LongType()),
            T.StructField("start", T.IntegerType()),
            T.StructField("end", T.IntegerType()),
        ]
    )
)


def window_table(
    df: DataFrame, id_col: str = "url", text_col: str = "text", k: int = X.EXSUB_K
) -> DataFrame:
    """(id, key, start, end) — one row per K-token window occurrence."""

    @pandas_udf(_WINDOW_TYPE)
    def win_udf(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: X.window_entries(t or "", k))

    return (
        df.select(F.col(id_col), F.explode(win_udf(F.col(text_col))).alias("w"))
        .select(id_col, "w.key", "w.start", "w.end")
    )


def exsub_dedup(
    df: DataFrame, id_col: str = "url", text_col: str = "text", k: int = X.EXSUB_K
) -> DataFrame:
    """input columns + (clean_text, n_chars_removed, n_dup_windows): every
    K-token run occurring more than once in the corpus is excised from all
    non-keeper occurrences (keeper = lexicographic min (doc_id, start))."""
    w = window_table(df, id_col, text_col, k)
    dup = (
        w.groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(F.struct(F.col(id_col), F.col("start"))).alias("keeper"),
        )
        .filter(F.col("n") > 1)
        .select("key", "keeper")
    )
    marked = (
        w.join(dup, "key")
        .filter(
            ~(
                (F.col(id_col) == F.col(f"keeper.{id_col}"))
                & (F.col("start") == F.col("keeper.start"))
            )
        )
        .select(id_col, "start", "end")
    )
    spans = marked.groupBy(id_col).agg(
        F.collect_list(F.struct("start", "end")).alias("__spans")
    )

    clean_type = T.StructType(
        [
            T.StructField("clean_text", T.StringType()),
            T.StructField("n_chars_removed", T.IntegerType()),
        ]
    )

    @pandas_udf(clean_type)
    def excise_udf(texts: pd.Series, spans_col: pd.Series) -> pd.DataFrame:
        out_t, out_n = [], []
        for t, sp in zip(texts, spans_col):
            pairs = [] if sp is None else [(x["start"], x["end"]) for x in sp]
            clean, removed = X.excise(t or "", pairs)
            out_t.append(clean)
            out_n.append(removed)
        return pd.DataFrame({"clean_text": out_t, "n_chars_removed": out_n})

    out = df.join(spans, id_col, "left")
    c = excise_udf(F.col(text_col), F.col("__spans"))
    return (
        out.withColumn("__c", c)
        .withColumn(
            # explicit NULL branch, not coalesce(size(...)): under legacy
            # non-ANSI conf size(NULL) returns -1 (not NULL), which the
            # coalesce would pass through — every clean doc would read
            # n_dup_windows=-1. build_session pins ANSI, but the operator
            # must not depend on session conf for its own contract.
            "n_dup_windows",
            F.when(F.col("__spans").isNull(), F.lit(0))
            .otherwise(F.size("__spans"))
            .cast("int"),
        )
        .select(
            *[F.col(x) for x in df.columns],
            F.col("__c.clean_text").alias("clean_text"),
            F.col("__c.n_chars_removed").alias("n_chars_removed"),
            "n_dup_windows",
        )
    )
