"""Batch/zip redaction sink (reference S10 analog): directory of CSV/TXT →
per-file redacted outputs + detections JSON + manifest, all in one deflate
zip; contents byte-identical to the single-file paths / pure-Python oracle."""

import csv
import json
import os
import zipfile

from pii_detection_redaction_spark.sources.batch import batch_redact


def _write_fixtures(d):
    rows_a = [
        ["name", "email", "notes"],
        ["Bob Smith", "bob.smith@ex.com", "call 0412 345 678"],
        ["Olivia Baker", "", "no pii here"],
    ]
    rows_b = [
        ["id", "contact"],
        ["1", "alice.wong@corp.io"],
        ["2", "plain text"],
    ]
    with open(os.path.join(d, "a.csv"), "w", newline="") as f:
        csv.writer(f).writerows(rows_a)
    with open(os.path.join(d, "b.csv"), "w", newline="") as f:
        csv.writer(f).writerows(rows_b)
    txt = "Dear Jane Doe,\nplease email jane.doe@ex.com or ring 0412 345 678.\n"
    with open(os.path.join(d, "memo.txt"), "w") as f:
        f.write(txt)
    with open(os.path.join(d, "clean.txt"), "w") as f:
        f.write("nothing sensitive in this note\n")
    return txt


def test_batch_redact_zip_bundle(spark, tmp_path):
    src = tmp_path / "in"
    out = tmp_path / "out"
    src.mkdir()
    txt = _write_fixtures(str(src))
    manifest = batch_redact(spark, str(src), str(out))

    # every input got its reference-named artifact, plus json + manifest
    names = {
        "a_redacted.csv", "b_redacted.csv", "memo_redacted.txt",
        "clean_redacted.txt", "a_detections.json", "b_detections.json",
        "memo_detections.json", "clean_detections.json", "manifest.json",
    }
    assert set(os.listdir(out)) == names | {"redacted_bundle.zip"}
    with zipfile.ZipFile(out / "redacted_bundle.zip") as zf:
        assert set(zf.namelist()) == names
        # zip contents == the on-disk artifacts (helpers.py zip semantics)
        for n in names:
            assert zf.read(n) == (out / n).read_bytes()

    # CSV: header + input row order preserved, PII gone, clean cells intact
    with open(out / "a_redacted.csv", newline="") as f:
        got = list(csv.reader(f))
    assert got[0] == ["name", "email", "notes"]
    assert len(got) == 3
    flat = " ".join(" ".join(r) for r in got)
    assert "bob.smith@ex.com" not in flat and "0412 345 678" not in flat
    assert got[2][2] == "no pii here"

    # TXT: byte-identical to the pure-Python relationship scrub
    from pii_detection_redaction_spark.core import analyze_long_text, scrub_document

    expect = scrub_document(txt, analyze_long_text(txt))
    assert (out / "memo_redacted.txt").read_text() == expect
    assert (out / "clean_redacted.txt").read_text() == (
        "nothing sensitive in this note\n"
    )

    # detections JSON: reference formatter.py:8-21 record shape
    dets = json.loads((out / "a_detections.json").read_text())
    assert dets and {"row", "column", "entity_type", "start", "end",
                     "score", "value", "cell_value"} == set(dets[0])
    email = [d for d in dets if d["entity_type"] == "EMAIL_ADDRESS"]
    assert email and email[0]["value"] == "bob.smith@ex.com"
    assert email[0]["cell_value"] == "bob.smith@ex.com"
    # scores arrive 4dp-rounded like the reference JSON export
    assert all(round(d["score"], 4) == d["score"] for d in dets)

    # manifest mirrors summarize_detections per file + totals
    m = json.loads((out / "manifest.json").read_text())
    assert set(m["files"]) == {"a.csv", "b.csv", "memo.txt", "clean.txt"}
    a = m["files"]["a.csv"]
    assert a["total_detections"] == len(dets)
    assert a["by_entity_type"]["EMAIL_ADDRESS"] == 1
    assert a["affected_cells"] >= 2
    assert m["files"]["clean.txt"]["total_detections"] == 0
    assert m["total_detections"] == sum(
        v["total_detections"] for v in m["files"].values()
    )
    assert manifest["total_detections"] == m["total_detections"]


def test_batch_redact_row_order_many_rows(spark, tmp_path):
    """The coalesce(1) single-file export preserves input row order across
    a multi-partition redaction (sort THEN coalesce)."""
    src = tmp_path / "in2"
    out = tmp_path / "out2"
    src.mkdir()
    rows = [["seq", "payload"]] + [
        [str(i), f"user{i}@ex.com" if i % 3 == 0 else f"note {i}"]
        for i in range(200)
    ]
    with open(src / "wide.csv", "w", newline="") as f:
        csv.writer(f).writerows(rows)
    batch_redact(spark, str(src), str(out), save_json=False)
    with open(out / "wide_redacted.csv", newline="") as f:
        got = list(csv.reader(f))
    assert got[0] == ["seq", "payload"]
    assert [r[0] for r in got[1:]] == [str(i) for i in range(200)]
    assert all("@" not in r[1] for r in got[1:])


def test_batch_redact_json_rows_are_input_indices_multipartition(
    spark, tmp_path
):
    """The detections JSON 'row' field is the 0-based INPUT row number even
    when the CSV scan splits into several partitions — the raw __row_id
    (monotonically_increasing_id) jumps by 2^33 at partition boundaries
    and must never leak into the artifact."""
    src = tmp_path / "in3"
    out = tmp_path / "out3"
    src.mkdir()
    rows = [["seq", "contact"]] + [
        [str(i), f"user{i}@ex.com"] for i in range(60)
    ]
    with open(src / "mp.csv", "w", newline="") as f:
        csv.writer(f).writerows(rows)
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "256")
    try:
        batch_redact(spark, str(src), str(out), save_json=True)
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
    with open(out / "mp_detections.json") as f:
        dets = json.load(f)
    got_rows = sorted(d["row"] for d in dets if d["entity_type"] == "EMAIL_ADDRESS")
    # every data row has exactly one planted email: dense 0..59
    assert got_rows == list(range(60))
    # and each row index points at the matching input row's email
    by_row = {d["row"]: d for d in dets if d["entity_type"] == "EMAIL_ADDRESS"}
    for i in (0, 31, 59):
        assert by_row[i]["cell_value"] == f"user{i}@ex.com"


def test_batch_redact_stem_collision_and_uri_names(spark, tmp_path):
    """A .csv and a .txt sharing a stem must not overwrite each other's
    detections JSON (the second claim gets a _2 suffix); txt names with
    spaces survive input_file_name()'s percent-encoding; the on-disk and
    zipped manifest.json carries the same 'zip' key the call returns."""
    src = tmp_path / "in3"
    out = tmp_path / "out3"
    src.mkdir()
    with open(src / "report.csv", "w", newline="") as f:
        csv.writer(f).writerows(
            [["contact"], ["carol.v@ex.com"]]
        )
    with open(src / "report.txt", "w") as f:
        f.write("ring 0412 345 678 please\n")
    with open(src / "my memo.txt", "w") as f:
        f.write("mail dave.k@ex.com today\n")
    manifest = batch_redact(spark, str(src), str(out))

    names = set(os.listdir(out))
    # both detections artifacts survive, disambiguated
    assert {"report_detections.json", "report_detections_2.json"} <= names
    csv_dets = json.loads((out / "report_detections.json").read_text())
    txt_dets = json.loads((out / "report_detections_2.json").read_text())
    assert {d["entity_type"] for d in csv_dets} == {"EMAIL_ADDRESS"}
    assert any("PHONE" in d["entity_type"] for d in txt_dets)
    # decoded real filename, not the percent-encoded URI basename
    assert "my memo_redacted.txt" in names
    assert "my%20memo_redacted.txt" not in names
    assert set(manifest["files"]) == {"report.csv", "report.txt", "my memo.txt"}
    # no duplicate entry names inside the zip; manifest zip key persisted
    with zipfile.ZipFile(out / "redacted_bundle.zip") as zf:
        entries = zf.namelist()
        assert len(entries) == len(set(entries))
        zipped = json.loads(zf.read("manifest.json"))
    on_disk = json.loads((out / "manifest.json").read_text())
    assert on_disk == zipped
    assert on_disk["zip"] == manifest["zip"] == "redacted_bundle.zip"


def test_batch_redact_export_row_cap_errors_cleanly(spark, tmp_path):
    """A CSV over max_export_rows must fail loudly BEFORE the driver-side
    row-order/detections collect (this sink is the operator-sized download
    surface), with a pointer to the corpus-scale paths; the same input
    passes with the cap lifted."""
    import pytest

    src = tmp_path / "in"
    out = tmp_path / "out"
    src.mkdir()
    with open(src / "big.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["seq", "contact"])
        for i in range(25):
            w.writerow([str(i), f"user{i}@ex.com"])
    with pytest.raises(ValueError, match="max_export_rows"):
        batch_redact(spark, str(src), str(out), max_export_rows=10)
    man = batch_redact(
        spark, str(src), str(out / "ok"), max_export_rows=100
    )
    assert man["files"]["big.csv"]["total_detections"] == 25
