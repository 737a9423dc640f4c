"""Gopher repetition metrics: pinned pure-Python spec, Spark JVM-expression
parity, and shuffle-free/Python-free plan shape."""

import pytest

from pyspark.sql import functions as F

from pii_detection_redaction_spark.core.quality import repetition_metrics
from pii_detection_redaction_spark.functions.quality import repetition_metric_columns

SAMPLES = [
    "a b c\na b c\nunique line",  # one fully duplicated line
    "word word word word",  # degenerate: one word repeated
    "x",  # single word, no bigram
    "",  # empty text
    "  \n\n  ",  # whitespace only
    "the cat sat on the cat sat on a mat",
    "line one\nline one\nline one\nother",  # 3x duplicate line
    "no repeats at all here today",
]


def test_spec_values():
    m = repetition_metrics("a b c\na b c\nunique line")
    # "a b c" (5 chars) appears twice -> 1 extra occurrence of 5 chars over
    # 5+5+11=21 total line chars
    assert m["dup_line_char_frac"] == pytest.approx(5 / 21)
    # words: a b c a b c unique line. Most frequent bigram: "a b" / "b c"
    # (count 2, char mass 2 each) -> 2*2=4 over word chars 1*6+6+4=16.
    # Frequency-first: the singleton "unique line" (10 chars) must NOT win.
    assert m["top_bigram_char_frac"] == pytest.approx(4 / 16)
    # top trigram "a b c" count 2 -> 2*3=6 / 16 (beats singleton
    # "c unique line" = 11 on frequency)
    assert m["top_trigram_char_frac"] == pytest.approx(6 / 16)

    z = repetition_metrics("")
    assert z == {
        "dup_line_char_frac": 0.0,
        "top_bigram_char_frac": 0.0,
        "top_trigram_char_frac": 0.0,
    }
    # single word: no n-grams, fractions 0 (guard against 0-len slice)
    s = repetition_metrics("x")
    assert s["top_bigram_char_frac"] == 0.0


def test_spark_matches_python_spec(spark):
    df = spark.createDataFrame([(t,) for t in SAMPLES], ["text"])
    cols = repetition_metric_columns(F.col("text"))
    rows = df.select(*[F.round(v, 6).alias(k) for k, v in cols.items()]).collect()
    for t, r in zip(SAMPLES, rows):
        exp = repetition_metrics(t)
        for k, v in exp.items():
            assert r[k] == pytest.approx(round(v, 6)), (t, k)


def test_plan_is_rowlocal_jvm(spark):
    """Per-doc metrics must be row-local JVM work: no shuffle, no Python."""
    df = spark.createDataFrame([(t,) for t in SAMPLES], ["text"])
    cols = repetition_metric_columns(F.col("text"))
    plan = (
        df.select(*[v.alias(k) for k, v in cols.items()])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
