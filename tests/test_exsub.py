"""Exact-substring dedup: spec semantics, Spark == pure reference on the
pages corpus, plan shape."""

from pyspark.sql import functions as F

from pii_detection_redaction_spark.core import exsub as X


def _words(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_merge_and_excise():
    assert X.merge_spans([(5, 10), (8, 12), (20, 25), (12, 14)]) == [(5, 14), (20, 25)]
    clean, n = X.excise("0123456789", [(2, 4), (3, 6)])
    assert clean == "016789" and n == 4


def test_exsub_spec_semantics():
    shared = _words("s", 25)  # 25-token run shared by a and b (k=20)
    a = f"{_words('a', 5)} {shared} {_words('z', 5)}"
    b = f"{_words('b', 5)} {shared} {_words('y', 5)}"
    c = _words("c", 40)  # unique — untouched
    res = X.exsub_clean([("a", a), ("b", b), ("c", c)], k=20)
    # keeper = lexicographic min (doc_id, start) -> doc 'a' keeps its copy
    assert res["a"] == (a, 0, 0)
    assert res["c"] == (c, 0, 0)
    clean_b, removed_b, nwin_b = res["b"]
    # the 6 overlapping duplicated windows merged into ONE maximal span
    assert nwin_b == 6
    assert shared not in clean_b
    assert clean_b.startswith(_words("b", 5)) and clean_b.endswith(_words("y", 5))
    assert removed_b == len(shared)


def test_exsub_self_repetition_keeps_first():
    run = _words("r", 22)
    doc = f"{run} mid1 mid2 mid3 {run}"
    res = X.exsub_clean([("d", doc)], k=20)
    clean, removed, _ = res["d"]
    # first occurrence kept, second excised
    assert clean.startswith(run)
    assert removed > 0 and clean.count("r0 ") == 1


def test_exsub_case_insensitive_matching():
    shared = _words("s", 20)
    res = X.exsub_clean([("a", shared.upper()), ("b", shared)], k=20)
    assert res["a"][1] == 0  # 'a' < 'b': upper-case copy is the keeper
    assert res["b"][1] == len(shared)


def test_spark_exsub_matches_reference(spark):
    import hashlib

    from pii_detection_redaction_spark.operators.exsub import exsub_dedup
    from pii_detection_redaction_spark.testing.corpus import ensure_pages_parquet

    df = spark.read.parquet(ensure_pages_parquet()).select("url", "text")
    got = {
        r.url: (r.clean_md5, r.n_chars_removed, r.n_dup_windows)
        for r in exsub_dedup(df).select(
            "url",
            F.md5("clean_text").alias("clean_md5"),
            "n_chars_removed",
            "n_dup_windows",
        ).collect()
    }
    rows = [(r.url, r.text) for r in df.collect()]
    want = X.exsub_clean(rows)
    assert len(got) == len(want)
    n_touched = 0
    for u, (clean, removed, nwin) in want.items():
        md5 = hashlib.md5(clean.encode("utf-8")).hexdigest()
        assert got[u] == (md5, removed, nwin), u
        n_touched += int(removed > 0)
    assert n_touched > 0  # planted 30-37-token boilerplate lines get excised


def test_exsub_dup_key_agg_is_partial(spark):
    """The corpus-scale shuffle (window keys) must combine map-side: both
    COUNT and the keeper MIN(struct) are partially aggregated."""
    from pii_detection_redaction_spark.operators.exsub import exsub_dedup

    df = spark.createDataFrame(
        [("a", _words("s", 25)), ("b", _words("s", 25))], ["url", "text"]
    )
    plan = exsub_dedup(df)._jdf.queryExecution().executedPlan().toString()
    assert "partial_count" in plan and "partial_min" in plan
