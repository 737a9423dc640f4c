"""JSONL source/sink — the other corpus interchange format web-text
pipelines meet everywhere (HF datasets dumps, RedPajama/Dolma releases ship
as .jsonl.gz).

Scale notes:
- the reader takes an EXPLICIT schema: ``spark.read.json`` without one runs
  a whole extra corpus pass for inference — never acceptable at 100 TB.
- binary payloads (html) ride as base64 (JSON has no bytes type);
  encode/decode are JVM ``base64``/``unbase64`` expressions, whole-stage
  codegen, so the payload never visits Python.
- gzipped JSONL files are non-splittable — like WARC, the FILE is the unit
  of parallelism, which matches how these corpora are sharded upstream
  (thousands of ~100 MB-1 GB files).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# the pages interchange schema (north-rule input_hint shape, html as b64)
PAGES_JSONL_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html_b64", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)


def read_pages_jsonl(
    spark: SparkSession, path: str, mode: str = "FAILFAST"
) -> DataFrame:
    """Read a .jsonl(.gz) pages corpus into the standard pages schema.

    Default mode is FAILFAST — same philosophy as the strict WARC parser: a
    malformed line fails its file's task with context instead of silently
    becoming a row of NULLs (PERMISSIVE, Spark's default) and corrupting
    lineage. Pass mode='PERMISSIVE' to quarantine downstream instead."""
    return (
        spark.read.schema(PAGES_JSONL_SCHEMA)
        .option("mode", mode)
        .json(path)
        .withColumn("html", F.unbase64("html_b64"))
        .drop("html_b64")
        .select("url", "warc_ts", "html", "text", "lang")
    )


def write_pages_jsonl(df: DataFrame, path: str) -> None:
    """Write a pages table as gzipped JSONL (one file per partition)."""
    cols = [c for c in df.columns if c != "html"]
    out = df
    if "html" in df.columns:
        out = df.withColumn("html_b64", F.base64("html")).drop("html")
        cols = cols + ["html_b64"]
    out.select(*cols).write.mode("overwrite").option(
        "compression", "gzip"
    ).json(path)
