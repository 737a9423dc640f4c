"""WARC source — Common-Crawl-layout ingestion for the pipeline.

Scale design: the WARC FILE is the unit of parallelism, exactly as in
production CC processing (a crawl is ~64k files of ~1 GB; per-record gzip
members make a file streamable but not splittable, so 1 file = 1 task and
the task count is the file count). ``spark.read.format("binaryFile")``
distributes the file listing; each task parses its own file with the
pure-Python ``core.warc`` parser inside ``mapInPandas`` — record payloads
are born in the right partition and never shuffle. Output schema matches
the parquet pages source (north-rule input_hint shape), so the quality
pipeline is source-agnostic.

binaryFile materializes one file per row (2 GB hard cap — CC files are
sized under it); a malformed record fails its FILE's task with byte-offset
context (core.warc is strict) rather than silently dropping rows.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

WARC_SCHEMA = T.StructType(
    [
        T.StructField("warc_file", T.StringType()),
        T.StructField("record_id", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("url", T.StringType()),
        T.StructField("http_status", T.IntegerType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("html", T.BinaryType()),
    ]
)

_COLS = [f.name for f in WARC_SCHEMA.fields]


def _naive_utc(date_iso: str):
    """WARC-Date ('...Z') -> naive-UTC pandas Timestamp (the repo-wide
    timestamp convention; Spark session tz is UTC)."""
    if not date_iso:
        return None
    ts = pd.Timestamp(date_iso)
    return ts.tz_convert(None) if ts.tzinfo is not None else ts


def _records_frame(path: str, content: bytes, warc_types) -> pd.DataFrame:
    from ..core.warc import parse_warc

    rows = []
    for rec in parse_warc(content):
        if rec.warc_type not in warc_types:
            continue
        rows.append(
            (
                path,
                rec.record_id,
                _naive_utc(rec.warc_date),
                rec.target_uri,
                rec.http_status,
                rec.http_content_type,
                rec.payload,
            )
        )
    return pd.DataFrame(rows, columns=_COLS)


def read_warc(
    spark: SparkSession,
    path: str,
    warc_types: Iterable[str] = ("response",),
) -> DataFrame:
    """Read a directory/glob of .warc / .warc.gz files into rows, one per
    record of the requested WARC-Type(s)."""
    wt = tuple(warc_types)
    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # zip over the columns, not iterrows(): iterrows boxes every
            # row into a pandas Series — pure overhead in the ingestion
            # hot loop whose cells are whole WARC files
            for path, content in zip(pdf["path"], pdf["content"]):
                yield _records_frame(path, bytes(content), wt)

    return files.mapInPandas(parse, WARC_SCHEMA)
