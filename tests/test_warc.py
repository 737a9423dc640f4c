"""WARC source: pure parser round trip, strictness, and the Spark reader
against the pages source of truth."""

import gzip

import pytest

from pii_detection_redaction_spark.core import warc as CW


def _rec(url, date, body):
    return CW.build_response_record(url, date, body)


RECS = [
    _rec("https://a.ex/1", "2025-01-01T00:00:00Z", "<html>héllo</html>".encode()),
    _rec("https://a.ex/2", "2025-01-01T00:00:01Z", b"<html>2</html>"),
]


@pytest.mark.parametrize("per_record_gzip", [True, False])
def test_warc_round_trip(tmp_path, per_record_gzip):
    p = str(tmp_path / ("f.warc.gz" if per_record_gzip else "f.warc"))
    CW.write_warc(RECS, p, per_record_gzip=per_record_gzip)
    out = list(CW.parse_warc(open(p, "rb").read()))
    assert [r.target_uri for r in out] == ["https://a.ex/1", "https://a.ex/2"]
    assert out[0].payload.decode() == "<html>héllo</html>"
    assert out[0].http_status == 200
    assert out[0].http_content_type == "text/html; charset=utf-8"
    assert out[0].warc_type == "response"
    assert out[0].warc_date == "2025-01-01T00:00:00Z"
    assert out[0].record_id.startswith("<urn:md5:")


def test_warc_parser_is_strict():
    """Malformed input must raise with context, never drop records: corrupt
    lineage at crawl scale is worse than a failed (quarantined) file."""
    with pytest.raises(CW.WarcFormatError, match="truncated record block"):
        list(CW.parse_warc(RECS[0][:-20]))
    with pytest.raises(CW.WarcFormatError, match="missing WARC version"):
        list(CW.parse_warc(b"HTTP/1.1 200 OK\r\n\r\nbody\r\n\r\n"))
    bad = RECS[0].replace(b"Content-Length:", b"X-Length:", 1)
    with pytest.raises(CW.WarcFormatError, match="Content-Length"):
        list(CW.parse_warc(bad))


def test_warc_gzip_members_are_concatenated_percolumn(tmp_path):
    """The CC layout is one gzip MEMBER per record; the parser must read all
    members, not just the first."""
    p = str(tmp_path / "f.warc.gz")
    CW.write_warc(RECS, p, per_record_gzip=True)
    raw = open(p, "rb").read()
    # two distinct gzip members present
    assert raw.count(b"\x1f\x8b\x08") >= 2
    assert len(list(CW.parse_warc(raw))) == 2
    # and a single-member whole-file gzip also parses
    whole = gzip.compress(b"".join(RECS), mtime=0)
    assert len(list(CW.parse_warc(whole))) == 2


def test_spark_warc_reader_matches_source_of_truth(spark):
    """Reader output == fields re-derived from the pages parquet (the same
    differential the warc_pages oracle runs, in-process)."""
    import hashlib

    from pii_detection_redaction_spark.sources.warc import read_warc
    from pii_detection_redaction_spark.testing.corpus import (
        N_ORACLE_PAGES,
        ensure_warc_dir,
        page_row,
    )

    out = read_warc(spark, ensure_warc_dir()).collect()
    assert len(out) == N_ORACLE_PAGES
    got = {r.url: r for r in out}
    for i in (0, 7, 123, N_ORACLE_PAGES - 1):
        src = page_row(i)
        r = got[src["url"]]
        assert bytes(r.html) == src["html"]
        assert r.http_status == 200
        assert r.warc_ts == src["warc_ts"].replace(tzinfo=None)
        assert r.record_id == CW._record_id(
            src["url"], src["warc_ts"].strftime("%Y-%m-%dT%H:%M:%SZ")
        )
        assert (
            hashlib.md5(bytes(r.html)).hexdigest()
            == hashlib.md5(src["html"]).hexdigest()
        )


def test_spark_warc_reader_plan_is_shuffle_free(spark):
    """Files are the parallelism unit; parse is mapInPandas — no Exchange."""
    from pii_detection_redaction_spark.sources.warc import read_warc
    from pii_detection_redaction_spark.testing.corpus import ensure_warc_dir

    plan = (
        read_warc(spark, ensure_warc_dir())
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_pipeline_over_warc_input(spark, tmp_path):
    """The full scrub/quality pipeline ingesting WARC files of the SAME
    corpus must produce the exact parquet-path counters — the source is a
    drop-in (north-rule input_hint shape from either format)."""
    from pii_detection_redaction_spark.plans.pipeline import (
        PipelineConfig,
        run_pipeline,
    )
    from pii_detection_redaction_spark.testing.corpus import ensure_warc_dir

    c = run_pipeline(
        spark,
        ensure_warc_dir(),
        str(tmp_path / "out"),
        PipelineConfig(num_buckets=16, groups=2),
        input_format="warc",
    )
    assert c["docs_seen"] == 500 and c["docs_kept"] == 335
    assert c["entities_scrubbed"] == 596 and c["tox_masked"] == 33
    assert c["extract_mismatch"] == 0


def test_negative_content_length_raises_not_loops():
    """A negative Content-Length would move the cursor backwards and
    re-yield the same record forever (executor hang + OOM); it must raise
    the quarantine error instead."""
    import pytest

    from pii_detection_redaction_spark.core.warc import (
        WarcFormatError,
        parse_warc,
    )

    data = b"WARC/1.0\r\nContent-Length: -33\r\n\r\n"
    with pytest.raises(WarcFormatError, match="negative Content-Length"):
        list(parse_warc(data))


def test_non_utf8_header_bytes_stay_in_the_quarantine_contract():
    """Real Common Crawl HTTP headers carry raw latin-1 (Server banners,
    Content-Disposition); values decode with a latin-1 fallback instead of
    raising a bare UnicodeDecodeError that WarcFormatError-filtering
    callers would miss; non-ASCII header NAMES and corrupt gzip containers
    raise WarcFormatError with context."""
    import gzip as _gzip

    import pytest

    from pii_detection_redaction_spark.core.warc import (
        WarcFormatError,
        parse_warc,
    )

    body = (b"HTTP/1.1 200 OK\r\nServer: caf\xe9-server\r\n"
            b"Content-Type: text/html\r\n\r\npayload")
    rec = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n" + body)
    (r,) = list(parse_warc(rec))
    assert r.http_status == 200 and r.payload == b"payload"

    bad_name = b"WARC/1.0\r\nCont\xe9nt-Length: 5\r\n\r\nxxxxx"
    with pytest.raises(WarcFormatError, match="non-ASCII"):
        list(parse_warc(bad_name))

    corrupt = _gzip.compress(rec)[:20]  # truncated gzip member
    with pytest.raises(WarcFormatError, match="corrupt gzip"):
        list(parse_warc(corrupt))
