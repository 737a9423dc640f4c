"""Custom stateful streaming operator: cross-batch first-seen dedup.

``applyInPandasWithState`` is the Spark surface for operators whose state
must outlive a micro-batch. The training-data use case: exact dedup of a
document stream — the first document with a given content hash is emitted,
every later duplicate (same batch, later batch, or after a restart) is
suppressed. State = one row per content hash in the state store, checkpointed
with the query, so exactly-once first-seen semantics survive restarts.

Scale shape: the groupBy(content_md5) shuffles only (hash, url) — never the
document text — and the state store holds one small row per distinct hash,
partitioned by the shuffle. This is the streaming twin of the batch
``operators/dedup.py::dedup_exact`` keeper logic.
"""

from __future__ import annotations

from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "content_md5 string, url string"
STATE_SCHEMA = "n_seen long"


def _make_first_seen_fn(key_out_col: str):
    """ONE first-seen state handler (exists-check, counter update,
    lexicographically-smallest-url within-batch winner), parameterized by
    the output key column name — the content-hash and canonical-url dedup
    streams share every semantic except that name."""

    def first_seen_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        rows = pd.concat(list(pdfs), ignore_index=True)
        seen_before = state.exists
        n_prior = state.get[0] if seen_before else 0
        state.update((n_prior + len(rows),))
        if not seen_before and len(rows):
            # deterministic within-batch winner: smallest url
            winner = rows.sort_values("url").iloc[0]
            yield pd.DataFrame({key_out_col: [key[0]], "url": [winner["url"]]})

    return first_seen_fn


_first_seen_fn = _make_first_seen_fn("content_md5")


def first_seen_dedup_stream(
    stream: DataFrame,
    text_col: str = "text",
    url_col: str = "url",
) -> DataFrame:
    """content-hash first-seen dedup over a streaming DataFrame; emits one
    (content_md5, url) row per hash the first time it appears."""
    keyed = stream.select(
        F.md5(F.col(text_col)).alias("content_md5"), F.col(url_col).alias("url")
    )
    return keyed.groupBy("content_md5").applyInPandasWithState(
        _first_seen_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_first_seen_dedup(
    spark,
    pages_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema_ddl: Optional[str] = None,
):
    """availableNow drain of the dedup stream to parquet; rerunning after new
    files land emits only hashes never seen in any prior run (state store +
    checkpoint persist across drains)."""
    from .pipeline import PAGES_DDL

    stream = (
        spark.readStream.schema(schema_ddl or PAGES_DDL)
        .format("parquet")
        .load(pages_dir)
    )
    out = first_seen_dedup_stream(stream)
    return (
        out.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


URL_OUTPUT_SCHEMA = "canonical_url string, url string"


_first_seen_url_fn = _make_first_seen_fn("canonical_url")


def first_seen_url_dedup_stream(stream: DataFrame, url_col: str = "url") -> DataFrame:
    """Streaming twin of the batch crawl dedup: canonicalize the URL
    (the SAME ``operators.web.canonical_url_col`` JVM chain — one spec) and
    emit each canonical URL's first-seen record; later crawl records of the
    same page are suppressed across micro-batches and restarts.

    Note the deliberate semantic difference from the batch
    ``dedup_latest_crawl``: a stream cannot keep "latest" without waiting
    forever, so streaming ingest dedups FIRST-seen (the standard crawl-
    frontier rule); a periodic batch compaction applies latest-wins. State
    is one counter row per canonical URL, shuffled without the page payload."""
    from ..operators.web import canonical_url_col

    keyed = stream.select(
        canonical_url_col(url_col).alias("canonical_url"),
        F.col(url_col).alias("url"),
    )
    return keyed.groupBy("canonical_url").applyInPandasWithState(
        _first_seen_url_fn,
        outputStructType=URL_OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
