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
