"""End-to-end CSV redaction source→sink (reference csv_redactor analog)."""

import csv
import glob

from pyspark.sql import functions as F

from pii_detection_redaction_spark.sources.csv import (
    detections_to_json,
    read_csv,
    redact_csv,
    write_csv,
)


def _write_input(path):
    rows = [
        ["name", "email", "phone", "notes"],
        ["Bob Smith", "bob.smith@ex.com", "0412 345 678", "meeting at noon"],
        ["Olivia Baker", "olivia.baker@ex.com", "", "tfn 123-456-789 on file"],
        ["", "", "", "no pii in this row"],
    ]
    with open(path, "w", newline="") as f:
        csv.writer(f).writerows(rows)


def test_csv_redaction_roundtrip(spark, tmp_path):
    src = str(tmp_path / "in.csv")
    _write_input(src)
    df = read_csv(spark, src)
    out = redact_csv(df)

    red = [r.asDict() for r in out["redacted"].collect()]
    assert len(red) == 3
    all_text = " ".join(str(v) for r in red for v in r.values())
    assert "bob.smith@ex.com" not in all_text
    assert "0412 345 678" not in all_text
    assert "123-456-789" not in all_text
    assert any("no pii in this row" in str(r["notes"]) for r in red)

    dets = out["detections"].collect()
    types = {r["entity_type"] for r in dets}
    assert {"EMAIL_ADDRESS", "AU_PHONE_NUMBER", "AU_TFN"} <= types
    # detection record shape: value column holds the matched text
    email_det = [r for r in dets if r["entity_type"] == "EMAIL_ADDRESS"]
    assert all("@" in r["value"] for r in email_det)

    summary = {r["entity_type"]: r["n_detections"] for r in out["summary"].collect()}
    assert summary["EMAIL_ADDRESS"] == 2

    # labels mode
    out2 = redact_csv(df, use_entity_labels=True)
    red2 = " ".join(
        str(v) for r in out2["redacted"].collect() for v in r.asDict().values()
    )
    assert "<EMAIL_ADDRESS>" in red2

    # sinks
    dst = str(tmp_path / "out_csv")
    write_csv(out["redacted"], dst)
    written = glob.glob(f"{dst}/*.csv")
    assert written
    j = detections_to_json(out["detections"]).collect()
    assert all(r["json"].startswith("{") for r in j)


def test_multifile_csv_preserves_input_order(spark, tmp_path):
    """Directory input: the ordered sink reproduces input row order —
    per file, files in lexicographic path order. File sizes are chosen
    anti-correlated with name order so Spark's size-descending split packing
    (the thing a bare monotonic-id sort would replay) would scramble it."""
    src = tmp_path / "csvdir"
    src.mkdir()
    sizes = {"part-a.csv": 2, "part-b.csv": 40, "part-c.csv": 10}
    seq = 0
    expected = []
    for fname, n in sorted(sizes.items()):
        with open(src / fname, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["seq", "email", "note"])
            for _ in range(n):
                w.writerow([f"s{seq:04d}", f"user{seq}@ex.com", f"note {seq}"])
                expected.append(f"s{seq:04d}")
                seq += 1

    df = read_csv(spark, str(src))
    out = redact_csv(df)
    dst = str(tmp_path / "ordered_out")
    write_csv(out["redacted"], dst)

    got = []
    all_rows = []
    for part in sorted(glob.glob(f"{dst}/part-*.csv")):
        with open(part, newline="") as f:
            rows = list(csv.reader(f))
        assert rows[0] == ["seq", "email", "note"]
        got.extend(r[0] for r in rows[1:])
        all_rows.extend(rows[1:])
    assert got == expected
    # every pii cell across EVERY part file was actually redacted
    assert all("@ex.com" not in ",".join(r) for r in all_rows)


def test_multiline_quoted_newlines(spark, tmp_path):
    """RFC-4180 quoted embedded newlines (reference's Python csv reader
    handles these): multiline=True parses the cell as ONE row; the default
    fast path documents the limitation."""
    src = str(tmp_path / "ml.csv")
    with open(src, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["name", "notes"])
        w.writerow(["Bob Smith", "line one\nemail bob.smith@ex.com, done"])
        w.writerow(["Plain", "nothing here"])
    df = read_csv(spark, src, multiline=True)
    assert df.count() == 2
    out = redact_csv(df)
    red = {r["name"]: r["notes"] for r in out["redacted"].collect()}
    assert "bob.smith@ex.com" not in red["Bob Smith"]
    assert "\n" in red["Bob Smith"]  # the cell is still one two-line value
    dets = out["detections"].collect()
    assert {r["entity_type"] for r in dets} >= {"EMAIL_ADDRESS"}


def test_quoted_header_names_survive_unpivot(spark, tmp_path):
    """Headers containing ' or ` are legitimate CSV — the stack() SQL must
    escape them instead of crashing the job."""
    src = str(tmp_path / "q.csv")
    with open(src, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["employee's email", "back`tick", "plain"])
        w.writerow(["bob.smith@ex.com", "x", "y"])
    out = redact_csv(read_csv(spark, src))
    red = out["redacted"].collect()[0]
    assert "bob.smith@ex.com" not in red["employee's email"]
    dets = out["detections"].collect()
    assert any(
        r["col_name"] == "employee's email"
        and r["entity_type"] == "EMAIL_ADDRESS"
        for r in dets
    )


def test_detections_json_rows_are_input_indices(spark, tmp_path):
    """detections_to_json(source=...) exports the 0-based input row index
    as 'row' (reference formatter.py shape) — never the partition-encoded
    raw __row_id — even when the scan splits into several partitions."""
    import json as _json

    src = str(tmp_path / "rows.csv")
    with open(src, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["seq", "contact"])
        for i in range(40):
            w.writerow([str(i), f"user{i}@ex.com"])
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "256")
    try:
        df = read_csv(spark, src)
        out = redact_csv(df, cache=True)
        lines = detections_to_json(out["detections"], source=df).collect()
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
    recs = [_json.loads(r["json"]) for r in lines]
    email_rows = sorted(
        r["row"] for r in recs if r["entity_type"] == "EMAIL_ADDRESS"
    )
    assert email_rows == list(range(40))
    assert all("__row_id" not in r for r in recs)
    # single-file export stays reference-shaped: no 'file' field
    assert all("file" not in r for r in recs)


def test_detections_json_directory_source_per_file_rows(spark, tmp_path):
    """For a directory source the reference CLI processes one file at a
    time, so 'row' restarts at 0 per input file; the export must carry the
    source file path too, or the per-file index locates nothing."""
    import json as _json

    d = tmp_path / "many"
    d.mkdir()
    # names with a space and a '+' pin the file field to the DECODED
    # filesystem path (the metadata column is a percent-encoded URI, and
    # naive url_decode would read '+' as a space)
    sizes = {"a report.csv": 3, "b+c.csv": 5}
    for name, n in sizes.items():
        with open(d / name, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["seq", "contact"])
            for i in range(n):
                w.writerow([str(i), f"user{i}@ex.com"])
    df = read_csv(spark, str(d))
    out = redact_csv(df, cache=True)
    recs = [
        _json.loads(r["json"])
        for r in detections_to_json(out["detections"], source=df).collect()
    ]
    emails = [r for r in recs if r["entity_type"] == "EMAIL_ADDRESS"]
    assert all("file" in r for r in emails)
    by_file = {}
    for r in emails:
        by_file.setdefault(r["file"].rsplit("/", 1)[-1], []).append(r["row"])
    assert {k: sorted(v) for k, v in by_file.items()} == {
        name: list(range(n)) for name, n in sizes.items()
    }
