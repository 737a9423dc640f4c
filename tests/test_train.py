"""Distributed trainer parity (operators.train): the Spark-counted models
must be bit-identical to the driver-trained ones on the same examples —
integer count sums are order-free, and counts→weights goes through the one
shared spec (ftlang.nb_loglik / CharTrigramLM.from_counts)."""

import random

import numpy as np
import pytest

from pii_detection_redaction_spark.core import ftlang, ftquality
from pii_detection_redaction_spark.core.lm import CharTrigramLM, _seed_text, doc_ngram_counts
from pii_detection_redaction_spark.operators import train as T


def _quality_training_rows():
    rows = []
    for lang in ftlang.LANGS:
        rng = random.Random(f"{ftquality.TRAIN_SEED}:pos:{lang}")
        rows += [
            (ftquality._pos_sentence(rng, lang), 1)
            for _ in range(ftquality.POS_SENTENCES_PER_LANG)
        ]
    for family in range(4):
        rng = random.Random(f"{ftquality.TRAIN_SEED}:neg:{family}")
        rows += [
            (ftquality._neg_example(rng, family), 0)
            for _ in range(ftquality.NEG_EXAMPLES_PER_FAMILY)
        ]
    return rows


def _balanced_rows(n):
    """First n//2 positives + first n-n//2 negatives — the full list puts
    all 1600 positives first, so a bare head slice is single-class and the
    trainer (correctly) refuses it."""
    rows = _quality_training_rows()
    pos = [r for r in rows if r[1] == 1]
    neg = [r for r in rows if r[1] == 0]
    return pos[: n // 2] + neg[: n - n // 2]


def _langid_training_rows():
    rows = []
    for lang in ftlang.LANGS:
        rng = random.Random(f"{ftlang.TRAIN_SEED}:{lang}")
        n = ftlang.TRAIN_SENTENCES_OVERRIDE.get(lang, ftlang.TRAIN_SENTENCES_PER_LANG)
        rows += [(ftlang._train_sentence(rng, lang), lang) for _ in range(n)]
    return rows


def test_quality_classifier_distributed_bitwise(spark):
    df = spark.createDataFrame(
        _quality_training_rows(), "text string, label int"
    ).repartition(7)
    W = T.train_quality_classifier(df)
    assert np.array_equal(W, ftquality.train_model())
    # scoring with the distributed matrix IS the embedded scorer
    probe = "the quick brown fox jumps over the lazy dog again and again"
    assert ftquality.predict_quality(probe, W) == ftquality.predict_quality(probe)


def test_quality_classifier_partition_invariant(spark):
    rows = _balanced_rows(300)
    one = T.train_quality_classifier(
        spark.createDataFrame(rows, "text string, label int").coalesce(1)
    )
    many = T.train_quality_classifier(
        spark.createDataFrame(rows, "text string, label int").repartition(8)
    )
    assert np.array_equal(one, many)


def test_quality_classifier_ignores_null_and_empty(spark):
    rows = _balanced_rows(200)
    base = spark.createDataFrame(rows, "text string, label int")
    noisy = spark.createDataFrame(
        rows + [(None, 1), ("", 0), ("x", None)], "text string, label int"
    )
    assert np.array_equal(
        T.train_quality_classifier(base), T.train_quality_classifier(noisy)
    )


def test_quality_classifier_nullable_float_labels(spark):
    """Nullable NUMERIC label columns reach pandas as float NaN, not None —
    those rows must be skipped, not counted as class 'nan'."""
    rows = _balanced_rows(100)
    base = spark.createDataFrame(rows, "text string, label int")
    floaty = spark.createDataFrame(
        [(t, float(y)) for t, y in rows] + [("noise text", None)],
        "text string, label double",
    )
    assert np.array_equal(
        T.train_quality_classifier(base), T.train_quality_classifier(floaty)
    )


def test_quality_classifier_unusable_labels_raise(spark):
    """String labels that don't cast to int null out silently in Spark; the
    trainer must fail loudly instead of saving an all-zero artifact."""
    df = spark.createDataFrame(
        [("some fine text", "good"), ("junky stuff", "junk")],
        "text string, label string",
    )
    with pytest.raises(ValueError, match="no usable training rows"):
        T.train_quality_classifier(df)


def test_quality_classifier_single_class_raises(spark):
    """Every-label-1 (or a 0 class whose texts are all empty) leaves one
    count column pure Laplace smoothing — the artifact would score every
    document toward the seen class with no signal. Must fail loudly."""
    all_one = spark.createDataFrame(
        [("some fine text", 1), ("more fine text", 1)], "text string, label int"
    )
    with pytest.raises(ValueError, match="single-class training input"):
        T.train_quality_classifier(all_one)
    empty_zero = spark.createDataFrame(
        [("some fine text", 1), ("", 0), (None, 0)], "text string, label int"
    )
    with pytest.raises(ValueError, match="single-class training input"):
        T.train_quality_classifier(empty_zero)


def test_langid_classifier_distributed_bitwise(spark):
    df = spark.createDataFrame(
        _langid_training_rows(), "text string, lang string"
    ).repartition(7)
    W, langs = T.train_langid_classifier(df)
    W_ref, langs_ref = ftlang.train_model()
    assert langs == langs_ref
    assert np.array_equal(W, W_ref)
    # end-to-end: predictions under the distributed matrix match
    probe = "the cat and the dog were in the house with the people"
    assert ftlang.predict(probe, (W, langs)) == ftlang.predict(probe)


def test_langid_unknown_label_raises(spark):
    df = spark.createDataFrame(
        [("bonjour le monde", "xx_not_a_lang")], "text string, lang string"
    )
    with pytest.raises(ValueError, match="xx_not_a_lang"):
        T.train_langid_classifier(df)


def _merge_doc_counts(texts):
    """Driver-side oracle: sum doc_ngram_counts over docs (same spec)."""
    per_order = [{}, {}, {}]
    for t in texts:
        if t is None:
            continue
        for o, (keys, cnt) in enumerate(doc_ngram_counts(t)):
            for k, n in zip(keys.tolist(), cnt.tolist()):
                per_order[o][k] = per_order[o].get(k, 0) + n
    return [
        (sorted(d), [d[k] for k in sorted(d)]) for d in per_order
    ]


def test_char_lm_distributed_matches_docwise_oracle(spark):
    texts = [
        _seed_text("en")[:3000],
        _seed_text("de")[:2000],
        "shared boundary text",
        "",
        None,
        "shared boundary text",  # duplicates must double the counts
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string").repartition(5)
    m = T.train_char_lm(df)
    uni, bi, tri = _merge_doc_counts(texts)
    ref = CharTrigramLM.from_counts(uni, bi, tri)
    for part in ("uni", "bi", "tri"):
        assert np.array_equal(
            getattr(m, f"{part}_keys"), getattr(ref, f"{part}_keys")
        )
        assert np.array_equal(getattr(m, f"{part}_cnt"), getattr(ref, f"{part}_cnt"))
    assert m.total == ref.total
    probe = "the boundary"
    assert m.perplexity(probe) == ref.perplexity(probe)


def test_char_lm_single_doc_equals_constructor(spark):
    text = _seed_text("en")[:4000]
    df = spark.createDataFrame([(text,)], "text string")
    m = T.train_char_lm(df)
    ref = CharTrigramLM(text)
    for part in ("uni", "bi", "tri"):
        assert np.array_equal(
            getattr(m, f"{part}_keys"), getattr(ref, f"{part}_keys")
        )
        assert np.array_equal(getattr(m, f"{part}_cnt"), getattr(ref, f"{part}_cnt"))
    assert m.total == ref.total
    assert m.perplexity("the dog") == ref.perplexity("the dog")


def test_char_lms_per_language_grouping(spark):
    rows = [(_seed_text("en")[:1500], "en"), (_seed_text("fr")[:1500], "fr")]
    df = spark.createDataFrame(rows, "text string, lang string")
    models = T.train_char_lms(df, lang_col="lang")
    assert sorted(models) == ["en", "fr"]
    ref_en = CharTrigramLM(rows[0][0])
    assert np.array_equal(models["en"].tri_keys, ref_en.tri_keys)
    assert np.array_equal(models["en"].tri_cnt, ref_en.tri_cnt)


def test_model_artifact_roundtrip(spark, tmp_path):
    rows = _balanced_rows(200)
    df = spark.createDataFrame(rows, "text string, label int")
    W = T.train_quality_classifier(df)
    qpath = str(tmp_path / "quality.npz")
    T.save_quality_model(qpath, W)
    kind, W2 = T.load_model(qpath)
    assert kind == "ftquality" and np.array_equal(W, W2)

    lpath = str(tmp_path / "langid.npz")
    W_ref, langs = ftlang.train_model()
    T.save_langid_model(lpath, W_ref, langs)
    kind, (W3, langs3) = T.load_model(lpath)
    assert kind == "ftlang" and langs3 == langs and np.array_equal(W3, W_ref)

    mpath = str(tmp_path / "lms.npz")
    models = T.train_char_lms(df.limit(20), lang_col=None)
    T.save_lm_models(mpath, models)
    kind, models2 = T.load_model(mpath)
    assert kind == "charlm" and sorted(models2) == sorted(models)
    for lang, m in models.items():
        assert np.array_equal(m.tri_keys, models2[lang].tri_keys)
        assert m.perplexity("probe text") == models2[lang].perplexity("probe text")


def test_pipeline_scores_with_trained_artifact(spark, pages_small, tmp_path):
    """cfg.quality_model=<npz path> routes a run_train artifact into the
    fused pipeline UDF (implies the annotation): quality_prob must equal
    predict_quality under the ARTIFACT's matrix, not the seed model's.
    Train with flipped labels so the two provably differ."""
    from pii_detection_redaction_spark.plans.pipeline import (
        PipelineConfig,
        transform_pages,
    )

    rows = [(t, 1 - y) for t, y in _balanced_rows(400)]
    W = T.train_quality_classifier(
        spark.createDataFrame(rows, "text string, label int")
    )
    path = str(tmp_path / "flipped.npz")
    T.save_quality_model(path, W)

    pages = spark.read.parquet(pages_small)
    cfg = PipelineConfig(num_buckets=8, groups=1, quality_model=path)
    got = (
        transform_pages(pages, cfg)
        .select("text", "quality_prob")
        .limit(30)
        .collect()
    )
    diverged = 0
    for r in got:
        assert r.quality_prob == ftquality.predict_quality(r.text or "", W)
        if r.quality_prob != ftquality.predict_quality(r.text or ""):
            diverged += 1
    assert diverged > 0  # the artifact, not the seed model, produced these

    # wrong artifact kind fails loudly
    import pytest as _pytest

    lm_path = str(tmp_path / "lm.npz")
    T.save_lm_models(lm_path, {"en": __import__(
        "pii_detection_redaction_spark.core.lm", fromlist=["CharTrigramLM"]
    ).CharTrigramLM("tiny text")})
    bad = PipelineConfig(num_buckets=8, groups=1, quality_model=lm_path)
    with _pytest.raises(ValueError, match="kind='charlm'"):
        transform_pages(pages, bad)


def test_save_model_normalizes_npz_suffix(tmp_path):
    """np.savez appends '.npz' to suffix-less paths; the savers must return
    the REAL written path so callers can reload what they wrote."""
    W = np.zeros((4, 2))
    written = T.save_quality_model(str(tmp_path / "model_v1"), W)
    assert written.endswith("model_v1.npz")
    kind, W2 = T.load_model(written)
    assert kind == "ftquality" and W2.shape == (4, 2)


def test_custom_model_scores_through_udf(spark):
    """make_ftquality_udf(W=...) scores with the custom matrix — the full
    train-on-cluster -> score-on-cluster loop."""
    from pyspark.sql import functions as F

    from pii_detection_redaction_spark.functions.udfs import make_ftquality_udf

    df = spark.createDataFrame(
        _balanced_rows(300), "text string, label int"
    )
    W = T.train_quality_classifier(df)
    udf = make_ftquality_udf(spark, W=W)
    probes = ["the people were in the house", "#### @@@@ {{{{ ^^^^ ||||"]
    got = (
        spark.createDataFrame([(t,) for t in probes], "text string")
        .select(udf(F.col("text")).alias("p"))
        .collect()
    )
    want = [ftquality.predict_quality(t, W) for t in probes]
    assert [r["p"] for r in got] == want


def test_quality_udf_factories_validate_matrix_shape(spark):
    """make_ftquality_udf(W=...) / make_quality_scrub_udf(quality_model=...)
    must reject wrong-shaped or integer matrices at FACTORY time (driver,
    clear message) — a langid matrix, a transposed array, or raw counts
    would otherwise fail deep inside predict_quality_many on an executor
    (or silently mis-score)."""
    from pii_detection_redaction_spark.core.ftlang import N_BUCKETS
    from pii_detection_redaction_spark.functions.udfs import (
        make_ftquality_udf,
        make_quality_scrub_udf,
    )

    bad_shapes = [
        np.zeros((N_BUCKETS, 7)),      # langid-shaped
        np.zeros((2, N_BUCKETS)),      # transposed
        np.zeros((N_BUCKETS,)),        # 1-D
    ]
    for W in bad_shapes:
        with pytest.raises(ValueError, match="quality log-likelihood matrix"):
            make_ftquality_udf(spark, W=W)
        with pytest.raises(ValueError, match="quality log-likelihood matrix"):
            make_quality_scrub_udf(quality_prob=True, quality_model=W)
    with pytest.raises(ValueError, match="dtype"):
        make_ftquality_udf(spark, W=np.zeros((N_BUCKETS, 2), dtype=np.int64))
    # the real artifact still passes
    make_ftquality_udf(spark, W=ftquality.model())
