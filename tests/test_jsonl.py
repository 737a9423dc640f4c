"""JSONL source/sink: stdlib-writer -> Spark-reader fidelity, Spark round
trip, explicit-schema plan, and pipeline ingestion parity."""

from pyspark.sql import functions as F

from pii_detection_redaction_spark.sources.jsonl import (
    read_pages_jsonl,
    write_pages_jsonl,
)
from pii_detection_redaction_spark.testing.corpus import (
    N_ORACLE_PAGES,
    ensure_jsonl_dir,
    ensure_pages_parquet,
    page_row,
)


def test_jsonl_reader_matches_source_of_truth(spark):
    out = read_pages_jsonl(spark, ensure_jsonl_dir()).collect()
    assert len(out) == N_ORACLE_PAGES
    got = {r.url: r for r in out}
    for i in (0, 13, 255, N_ORACLE_PAGES - 1):
        src = page_row(i)
        r = got[src["url"]]
        assert bytes(r.html) == src["html"]  # base64 round trip, byte-exact
        assert r.text == src["text"] and r.lang == src["lang"]
        assert r.warc_ts == src["warc_ts"].replace(tzinfo=None)


def test_jsonl_spark_round_trip(spark, tmp_path):
    """write_pages_jsonl -> read_pages_jsonl is the identity on the pages
    schema (gzip codec, base64 binary, timestamps)."""
    df = spark.read.parquet(ensure_pages_parquet())
    p = str(tmp_path / "j")
    write_pages_jsonl(df, p)
    back = read_pages_jsonl(spark, p)
    a = df.select(F.md5(F.col("html").cast("string")).alias("h"), "url",
                  "text", "lang", "warc_ts").orderBy("url").collect()
    b = back.select(F.md5(F.col("html").cast("string")).alias("h"), "url",
                    "text", "lang", "warc_ts").orderBy("url").collect()
    assert a == b


def test_jsonl_reader_plan_no_inference_no_shuffle(spark):
    """Explicit schema: the scan must be a single JSON FileScan with our
    ReadSchema — no inference pass materializes, no Exchange."""
    plan = (
        read_pages_jsonl(spark, ensure_jsonl_dir())
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "unbase64" in plan  # payload decode stays JVM-side


def test_pipeline_over_jsonl_input(spark, tmp_path):
    """Full pipeline ingesting the JSONL re-encoding reproduces the pinned
    parquet-path counters exactly (third drop-in source)."""
    from pii_detection_redaction_spark.plans.pipeline import (
        PipelineConfig,
        run_pipeline,
    )

    c = run_pipeline(
        spark,
        ensure_jsonl_dir(),
        str(tmp_path / "out"),
        PipelineConfig(num_buckets=16, groups=2),
        input_format="jsonl",
    )
    assert c["docs_seen"] == 500 and c["docs_kept"] == 335
    assert c["entities_scrubbed"] == 596 and c["tox_masked"] == 33
    assert c["extract_mismatch"] == 0


def test_jsonl_reader_failfast_on_malformed(spark, tmp_path):
    """Strict by default (WARC-parser philosophy): a malformed line fails
    the read rather than silently becoming NULLs; PERMISSIVE opt-in."""
    import gzip

    import pytest

    p = tmp_path / "bad"
    p.mkdir()
    with gzip.open(p / "part.jsonl.gz", "wt", encoding="utf-8") as fh:
        fh.write('{"url": "https://a.ex/1", "text": "ok", "lang": "en"}\n')
        fh.write("this is not json\n")
    with pytest.raises(Exception, match="Malformed|FAILFAST"):
        read_pages_jsonl(spark, str(p)).collect()
    rows = read_pages_jsonl(spark, str(p), mode="PERMISSIVE").collect()
    assert len(rows) == 2  # quarantine-downstream mode keeps the null row
