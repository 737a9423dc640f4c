"""Optional boilerplate-strip pipeline stage vs the pure-Python oracle.

The oracle applies core.quality.{boilerplate_line_set, strip_boilerplate}
over the extracted corpus text, then runs the normal decision flow on the
stripped text — the Spark pipeline with strip_boilerplate=True must match
per url: keep flag, scrubbed text byte-identical, and the lines_removed
counter equal to the oracle's total."""

import pytest

from pii_detection_redaction_spark.core import analyze_long_text
from pii_detection_redaction_spark.core.langid import detect_language
from pii_detection_redaction_spark.core.lm import perplexity
from pii_detection_redaction_spark.core.quality import (
    BOILERPLATE_MIN_DOCS,
    boilerplate_line_set,
    quality_decision,
    strip_boilerplate,
)
from pii_detection_redaction_spark.core.scrub import scrub_document
from pii_detection_redaction_spark.core.toxicity import mask_toxicity
from pii_detection_redaction_spark.plans.pipeline import (
    PipelineConfig,
    read_output,
    run_pipeline,
)
from pii_detection_redaction_spark.testing.corpus import pages_df

N = 200


@pytest.fixture(scope="module")
def oracle():
    df = pages_df(N)
    hot = boilerplate_line_set(df["text"], BOILERPLATE_MIN_DOCS)
    assert hot, "corpus must plant cross-page repeated lines"
    out = {}
    total_removed = 0
    for _, r in df.iterrows():
        text, removed = strip_boilerplate(r.text, hot)
        total_removed += removed
        lang, conf = detect_language(text)
        ppl = perplexity(text, lang)
        keep, _ = quality_decision(text, lang, conf, ppl)
        dets = analyze_long_text(text) if keep else []
        scrubbed = mask_toxicity(scrub_document(text, dets)) if keep else None
        out[r.url] = {"keep": keep, "scrubbed": scrubbed, "removed": removed}
    return out, total_removed


def test_strip_stage_matches_oracle(spark, tmp_path, oracle):
    from conftest import _pages_parquet

    exp, total_removed = oracle
    pages = _pages_parquet(N, f"pages_boiler_{N}.parquet")
    cfg = PipelineConfig(num_buckets=8, groups=2, strip_boilerplate=True)
    counters = run_pipeline(spark, pages, str(tmp_path / "out"), cfg)

    assert counters["lines_removed"] == total_removed > 0
    rows = {r["url"]: r for r in read_output(spark, str(tmp_path / "out")).collect()}
    assert len(rows) == N
    mismatch_keep = [u for u in exp if rows[u]["keep"] != exp[u]["keep"]]
    assert mismatch_keep == []
    mismatch_text = [
        u for u in exp if rows[u]["scrubbed_text"] != exp[u]["scrubbed"]
    ]
    assert mismatch_text == []
    for u in exp:
        assert rows[u]["boiler_removed"] == exp[u]["removed"]


def test_strip_changes_something(oracle):
    """The stage is non-vacuous on the corpus: at least one page loses a
    line, guarding against a hot-set regression making this test moot."""
    exp, total_removed = oracle
    assert total_removed >= 5
    assert any(v["removed"] > 0 for v in exp.values())
