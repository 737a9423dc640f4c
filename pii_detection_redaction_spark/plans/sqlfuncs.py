"""SQL-surface registration: use the engine from pure ``spark.sql``.

The reference exposes its pipeline through CLIs (SURVEY.md §3); the
Spark-idiomatic equivalent of "callable from anywhere" is registering the
vectorized UDFs as SQL functions, so a user can write

    SELECT url, pii_scrub(text) AS clean, size(pii_detect(text)) AS n
    FROM pages WHERE langid(text).lang = 'en'

with the same Arrow-batched, init-once execution as the DataFrame API
(``spark.udf.register`` of a pandas_udf keeps the vectorized path — no
row-at-a-time fallback).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.pandas.functions import pandas_udf

import pandas as pd

from ..functions.udfs import make_detect_udf, make_langid_udf


def _scrub_series(texts: pd.Series, post=None) -> pd.Series:
    """Shared body of the scrub SQL functions: null/empty passthrough,
    analyze → scrub, optional post-transform (toxicity mask). One place to
    keep chunking/scrub defaults so the two registrations cannot diverge."""
    from ..core import chunker as _chunker
    from ..core import scrub as _scrub

    out = []
    for t in texts:
        if not t:
            out.append(t)
            continue
        s = _scrub.scrub_document(t, _chunker.analyze_long_text(t))
        out.append(post(s) if post is not None else s)
    return pd.Series(out, dtype="object")


def register_sql_functions(spark: SparkSession) -> None:
    """Register ``pii_detect``, ``pii_scrub``, ``pii_scrub_all`` (PII scrub +
    toxicity mask) and ``langid`` for SQL use."""
    spark.udf.register("pii_detect", make_detect_udf())
    spark.udf.register("langid", make_langid_udf())

    @pandas_udf("string")
    def pii_scrub(texts: pd.Series) -> pd.Series:
        return _scrub_series(texts)

    @pandas_udf("string")
    def pii_scrub_all(texts: pd.Series) -> pd.Series:
        from ..core.toxicity import mask_toxicity

        return _scrub_series(texts, post=mask_toxicity)

    spark.udf.register("pii_scrub", pii_scrub)
    spark.udf.register("pii_scrub_all", pii_scrub_all)
