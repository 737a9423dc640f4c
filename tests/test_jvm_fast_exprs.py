"""Spark-engine derived fast expressions == the shared spec constants.

``functions.quality`` evaluates three hot metric expressions through
derived forms (``nonspace_count`` translate, ``STOP_RE_JVM`` /
``TOXICITY_RE_JVM`` first-char-lookahead alternations) while the SPEC
constants (``NONSPACE_RE``, ``STOP_RE``, ``TOXICITY_REGEX``) remain what
the pure-Python oracle and the DuckDB SQL oracle consume. These tests pin
Spark-vs-Spark equality of derived and spec forms — on the corpus and on
adversarial rows (unicode spaces, case edges, boundary digits) — so the
derivation can never silently change a metric.
"""

import pyspark.sql.functions as F
import pytest

from pii_detection_redaction_spark.core.toxicity import TOXIC_MASK, TOXICITY_REGEX
from pii_detection_redaction_spark.functions.quality import (
    NONSPACE_RE,
    STOP_RE,
    STOP_RE_JVM,
    TOXICITY_RE_JVM,
    WORD_RE,
    WORD_RE_JVM,
    fast_word_alternation,
    nonspace_count,
)

ADVERSARIAL = [
    "",
    " \t\n\x0b\f\r",
    "plain words the and of",
    "THE AND OF IS IN TO",  # uppercase stopwords under (?i)
    "The quick bitch, BASTARD; arsehole.",
    "no break line thin",  # unicode spaces: Java \S, not \s
    "x1bitch bitch1 bitch'‑s bitch",  # boundary edges around digits/quotes
    "…ellipsis line…\nsecond line\n\n\nthird",
    "ｆｕｌｌｗｉｄｔｈ ｔｅｘｔ",
    "Kelvin sign edge",  # Java (?i) folds ASCII only
    "word-with-bastardinside and bastard alone",
]


def _rows(spark):
    from pii_detection_redaction_spark.testing.corpus import pages_df

    texts = pages_df(200)["text"].tolist() + ADVERSARIAL
    return spark.createDataFrame([(t,) for t in texts], "t string")


def test_nonspace_translate_equals_regex(spark):
    df = _rows(spark)
    bad = df.select(
        (F.regexp_count("t", F.lit(NONSPACE_RE)) != nonspace_count(F.col("t")))
        .cast("long")
        .alias("d")
    ).agg(F.sum("d")).collect()[0][0]
    assert bad == 0


@pytest.mark.parametrize(
    "spec,fast", [(STOP_RE, STOP_RE_JVM), (TOXICITY_REGEX, TOXICITY_RE_JVM)]
)
def test_lookahead_alternation_equals_spec(spark, spec, fast):
    assert fast != spec  # the derivation must actually have fired
    df = _rows(spark)
    bad = df.select(
        (
            F.regexp_count("t", F.lit(spec)) != F.regexp_count("t", F.lit(fast))
        ).cast("long").alias("d")
    ).agg(F.sum("d")).collect()[0][0]
    assert bad == 0


def test_lookahead_replace_equals_spec(spark):
    df = _rows(spark)
    bad = df.select(
        (
            F.regexp_replace("t", TOXICITY_REGEX, TOXIC_MASK)
            != F.regexp_replace("t", TOXICITY_RE_JVM, TOXIC_MASK)
        ).cast("long").alias("d")
    ).agg(F.sum("d")).collect()[0][0]
    assert bad == 0


def test_possessive_word_count_equals_spec(spark):
    df = _rows(spark)
    bad = df.select(
        (
            F.regexp_count("t", F.lit(WORD_RE))
            != F.regexp_count("t", F.lit(WORD_RE_JVM))
        ).cast("long").alias("d")
    ).agg(F.sum("d")).collect()[0][0]
    assert bad == 0


def test_fast_word_alternation_rejects_non_literal_shapes():
    # unexpected shapes must come back unchanged, never mis-derived
    for rx in [
        r"\d+",
        r"(?i)\b(?:a.c|def)\b",  # metacharacter inside a word
        r"\b(?:ok|fine)\s",  # missing the trailing \b
        r"(?i)(?:no|anchor)",
    ]:
        assert fast_word_alternation(rx) == rx
