"""North-rule packaging evidence: the pipeline job runs under real
``spark-submit --py-files pii_spark.zip`` on a multi-executor
``local-cluster`` master, with the zip as the ONLY route to the package.

The job script is copied to a temp dir and launched with cwd there and a
scrubbed PYTHONPATH, so neither the driver nor the executor Python workers
can see the repo checkout — imports must resolve through the shipped zip
(driver via spark-submit's PYTHONPATH injection, executors via file-server
distribution to their own working directories: separate JVMs, separate
worker processes). Counters are checked against the pure-Python oracle."""

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

from pii_detection_redaction_spark.core.langid import detect_language
from pii_detection_redaction_spark.core.lm import perplexity
from pii_detection_redaction_spark.core.quality import quality_decision
from pii_detection_redaction_spark.testing.corpus import pages_df

from conftest import REPO, _pages_parquet

N_PAGES = 120


def _spark_submit() -> str:
    exe = shutil.which("spark-submit")
    if exe:
        return exe
    import pyspark

    cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    if os.path.exists(cand):
        return cand
    pytest.skip("spark-submit not found")


def _build_zip(dst_dir: str) -> str:
    pkg = os.path.join(REPO, "pii_detection_redaction_spark")
    zpath = os.path.join(dst_dir, "pii_spark.zip")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO))
    return zpath


def test_pipeline_under_spark_submit_pyfiles(tmp_path):
    submit = _spark_submit()
    zpath = _build_zip(str(tmp_path))
    job = str(tmp_path / "run_pipeline.py")
    shutil.copy(os.path.join(REPO, "jobs", "run_pipeline.py"), job)
    pages = _pages_parquet(N_PAGES, f"pages_submit_{N_PAGES}.parquet")
    out = str(tmp_path / "out")

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only package source
    env["PYSPARK_PYTHON"] = env["PYSPARK_DRIVER_PYTHON"] = sys.executable

    proc = subprocess.run(
        [
            submit,
            "--master", "local-cluster[2,2,2048]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zpath,
            job,
            "--input", pages,
            "--output", out,
            "--buckets", "4",
            "--groups", "2",
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    counters = json.loads(proc.stdout.strip().splitlines()[-1])

    expected_kept = 0
    for _, r in pages_df(N_PAGES).iterrows():
        lang, conf = detect_language(r.text)
        keep, _ = quality_decision(r.text, lang, conf, perplexity(r.text, lang))
        expected_kept += int(keep)

    assert counters["docs_seen"] == N_PAGES
    assert counters["docs_kept"] == expected_kept
    assert counters["docs_dropped"] == N_PAGES - expected_kept
    assert counters["extract_mismatch"] == 0
