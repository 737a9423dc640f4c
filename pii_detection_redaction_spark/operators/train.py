"""Distributed model training over DataFrames — the "train the filter on the
cluster" half of the CCNet/DCLM workflow the scoring side of this engine
already implements (fastText-style classifiers in ``core.ftlang`` /
``core.ftquality``, the char-trigram perplexity LM in ``core.lm``).

At 100 TB the seed corpora these models are fitted on (Wikipedia-quality
positives, curated junk negatives, per-language reference text) are
themselves Spark tables, so fitting must be a distributed count, not a
driver loop. All three trainers here share one shape:

- **map side**: ``mapInPandas`` consumes the partition's Arrow batches and
  emits ONE pre-aggregated sparse count table per partition (``(bucket,
  cls, cnt)`` for the NB classifiers, ``(cls, order, key, cnt)`` for the
  LM). Text never shuffles; what crosses the wire is bounded by the model's
  vocabulary per partition, not by rows.
- **reduce side**: one ``groupBy(...).sum`` — partial aggregation applies
  map-side, the shuffle key space is the vocabulary (≲2^17 buckets × a few
  classes), skew-free by construction.
- **driver**: ``collect`` bounded by the MODEL size (the same bound every
  fitted model has to obey anyway to be broadcast for scoring), then the
  identical count→weight arithmetic the driver-side trainers use
  (``ftlang.nb_loglik``, ``CharTrigramLM.from_counts``) — so distributed
  and driver training of the same examples produce bit-identical models
  (integer count sums are order-free; the float ops see the same inputs).
  Pinned by ``tests/test_train.py``.

Scoring with a trained artifact goes through the existing broadcast UDFs
(``functions.udfs.make_ftquality_udf(W=...)``); ``jobs/run_train.py`` is
the spark-submit CLI (parquet in, ``.npz`` artifact out).

No reference counterpart: the reference ships pretrained presidio/spaCy
models and has no training surface; this extends the engine the way a
web-scale pipeline needs (CCNet trains KenLM + fastText per shard).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..core.ftlang import LANGS, N_BUCKETS, bucket_counts, nb_loglik
from ..core.lm import CharTrigramLM, doc_ngram_counts

_COUNT_SCHEMA = "bucket long, cls string, cnt long"
_LM_SCHEMA = "cls string, ord int, key long, cnt long"


def ngram_class_counts(
    df: DataFrame, text_col: str = "text", class_col: str = "cls"
) -> DataFrame:
    """Hashed char n-gram counts per class: ``(bucket, cls, cnt)`` with one
    row per (bucket, class) pair over the whole input. The feature space is
    exactly ``core.ftlang.bucket_counts`` (the scoring space). NULL text or
    NULL class rows contribute nothing.

    Scale: the Python stage emits at most ``distinct-grams × classes`` rows
    per PARTITION (pre-aggregated across the partition's batches before
    anything is yielded), the ``groupBy`` shuffles only those sparse rows,
    and the key space is capped at ``N_BUCKETS × n_classes``.
    """

    def count_partition(batches):
        acc: Dict[str, Dict[int, int]] = {}
        for pdf in batches:
            for t, c in zip(pdf[text_col], pdf[class_col]):
                if pd.isna(t) or pd.isna(c):
                    continue  # None, float NaN (nullable numeric cols), pd.NA
                bag = bucket_counts(t)
                if not bag:
                    continue
                tgt = acc.setdefault(str(c), {})
                for b, n in bag.items():
                    tgt[b] = tgt.get(b, 0) + n
        out = {"bucket": [], "cls": [], "cnt": []}
        for c, bag in acc.items():
            out["bucket"].extend(bag.keys())
            out["cls"].extend([c] * len(bag))
            out["cnt"].extend(bag.values())
        yield pd.DataFrame(out)

    counts = df.select(text_col, class_col).mapInPandas(
        count_partition, _COUNT_SCHEMA
    )
    return counts.groupBy("bucket", "cls").agg(F.sum("cnt").alias("cnt"))


def _counts_matrix(
    df: DataFrame, text_col: str, class_col: str, classes: Sequence[str]
) -> np.ndarray:
    rows = ngram_class_counts(df, text_col, class_col).collect()
    index = {c: i for i, c in enumerate(classes)}
    counts = np.zeros((N_BUCKETS, len(classes)), dtype=np.int64)
    unknown = sorted({r["cls"] for r in rows if r["cls"] not in index})
    if unknown:
        raise ValueError(
            f"training rows carry classes {unknown} not in {list(classes)}"
        )
    for r in rows:
        counts[r["bucket"], index[r["cls"]]] = r["cnt"]
    return counts


def train_quality_classifier(
    df: DataFrame, text_col: str = "text", label_col: str = "label"
) -> np.ndarray:
    """Fit the ``core.ftquality`` NB matrix from a labeled DataFrame
    (``label`` ∈ {0 = junk, 1 = good}; any castable-to-int column works).
    Returns the ``(N_BUCKETS, 2)`` weight matrix — the same object
    ``ftquality.train_model()`` produces, and bit-identical to it when fed
    the same examples (pinned by ``test_quality_classifier_distributed``).
    Score with ``functions.udfs.make_ftquality_udf(W=...)`` or
    ``ftquality.predict_quality(text, W)``."""
    labeled = df.select(
        F.col(text_col).alias("text"),
        # try_cast, not cast: under ANSI an uncastable label (e.g. 'good')
        # would throw an opaque NumberFormatException inside an executor;
        # NULLing it routes every bad-label shape into the loud check below
        F.col(label_col).try_cast("int").cast("string").alias("cls"),
    )
    counts = _counts_matrix(labeled, "text", "cls", ("0", "1"))
    if counts.sum() == 0:
        # uncastable labels null out under try_cast and every row is
        # dropped map-side — an all-zero count matrix would save as a
        # valid-looking artifact that scores every document 0.5. Fail the
        # training job instead.
        raise ValueError(
            f"no usable training rows: column {label_col!r} must cast to "
            f"int 0 (junk) / 1 (good) and {text_col!r} must be non-empty"
        )
    per_class = counts.sum(axis=0)
    if (per_class == 0).any():
        # one-class input: the absent class's column would be pure Laplace
        # smoothing, so the saved artifact scores essentially every document
        # toward the seen class with no signal behind it. Fail loudly — a
        # real labeling job always has both classes.
        missing = [name for name, tot in zip(("0", "1"), per_class) if tot == 0]
        raise ValueError(
            f"single-class training input: class(es) {missing} contributed "
            f"zero n-gram counts (per-class totals {per_class.tolist()}); "
            "provide labeled examples of both 0 (junk) and 1 (good)"
        )
    return nb_loglik(counts)


def train_langid_classifier(
    df: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
    langs: Sequence[str] = LANGS,
) -> Tuple[np.ndarray, Tuple[str, ...]]:
    """Fit the ``core.ftlang`` NB matrix from ``(text, lang)`` rows; returns
    ``(W, langs)`` exactly like ``ftlang.train_model()`` (and bit-identical
    to it on the same examples). Unknown language labels raise — silently
    folding them into a column would corrupt the softmax denominator."""
    labeled = df.select(F.col(text_col).alias("text"), F.col(lang_col).alias("cls"))
    return nb_loglik(_counts_matrix(labeled, "text", "cls", tuple(langs))), tuple(
        langs
    )


def char_ngram_counts(
    df: DataFrame, text_col: str = "text", class_col: Optional[str] = None
) -> DataFrame:
    """Distributed char 1/2/3-gram counts for the perplexity LM:
    ``(cls, ord, key, cnt)`` where ``ord`` ∈ {1,2,3} and ``key`` packs the
    gram's codepoints into 16-bit digits (``core.lm.doc_ngram_counts`` — the
    ONE counting spec). Counting is per document, so no gram spans a
    document boundary (unlike naive corpus concatenation). ``class_col``
    (usually a language column) groups counts into one model per class;
    omitted, everything trains one model under cls=''. Same scale shape as
    ``ngram_class_counts``: per-partition pre-aggregation, vocabulary-bounded
    shuffle."""
    cols = [text_col] + ([class_col] if class_col else [])

    def count_partition(batches):
        acc: Dict[Tuple[str, int], Dict[int, int]] = {}
        for pdf in batches:
            texts = pdf[text_col]
            classes = pdf[class_col] if class_col else [""] * len(pdf)
            for t, c in zip(texts, classes):
                if pd.isna(t) or pd.isna(c):
                    continue  # None, float NaN (nullable numeric cols), pd.NA
                per_order = doc_ngram_counts(t)
                for o, (keys, cnt) in enumerate(per_order, start=1):
                    tgt = acc.setdefault((str(c), o), {})
                    for k, n in zip(keys.tolist(), cnt.tolist()):
                        tgt[k] = tgt.get(k, 0) + n
        out = {"cls": [], "ord": [], "key": [], "cnt": []}
        for (c, o), bag in acc.items():
            out["cls"].extend([c] * len(bag))
            out["ord"].extend([o] * len(bag))
            out["key"].extend(bag.keys())
            out["cnt"].extend(bag.values())
        yield pd.DataFrame(out)

    counts = df.select(*cols).mapInPandas(count_partition, _LM_SCHEMA)
    return counts.groupBy("cls", "ord", "key").agg(F.sum("cnt").alias("cnt"))


def train_char_lms(
    df: DataFrame, text_col: str = "text", lang_col: Optional[str] = None
) -> Dict[str, CharTrigramLM]:
    """Fit ``CharTrigramLM`` models from a reference corpus DataFrame — one
    per distinct ``lang_col`` value (or a single model under key ``''``).
    The driver collect is bounded by the models' vocabulary (the same arrays
    that get broadcast for scoring). A single-document input reproduces
    ``CharTrigramLM(text)`` exactly."""
    rows = char_ngram_counts(df, text_col, lang_col).collect()
    per: Dict[str, Dict[int, Tuple[list, list]]] = {}
    for r in rows:
        keys, cnt = per.setdefault(r["cls"], {}).setdefault(r["ord"], ([], []))
        keys.append(r["key"])
        cnt.append(r["cnt"])
    out: Dict[str, CharTrigramLM] = {}
    for c, orders in per.items():
        uni, bi, tri = (orders.get(o, ([], [])) for o in (1, 2, 3))
        out[c] = CharTrigramLM.from_counts(uni, bi, tri)
    return out


def train_char_lm(df: DataFrame, text_col: str = "text") -> CharTrigramLM:
    """One-model convenience wrapper over ``train_char_lms`` (empty input
    yields the empty model, matching ``CharTrigramLM("")``)."""
    models = train_char_lms(df, text_col=text_col, lang_col=None)
    return models.get("", CharTrigramLM(""))


# ---------------------------------------------------------------------------
# model artifact IO (spark-submit jobs write/load these)
# ---------------------------------------------------------------------------


def _npz_path(path: str) -> str:
    # np.savez silently APPENDS '.npz' to a suffix-less path, which would
    # make the path we report/return diverge from the file actually written
    # (and load_model on the reported path would FileNotFoundError)
    return path if path.endswith(".npz") else path + ".npz"


def save_quality_model(path: str, W: np.ndarray) -> str:
    path = _npz_path(path)
    np.savez_compressed(path, kind="ftquality", W=W)
    return path


def save_langid_model(path: str, W: np.ndarray, langs: Sequence[str]) -> str:
    path = _npz_path(path)
    np.savez_compressed(path, kind="ftlang", W=W, langs=np.asarray(list(langs)))
    return path


def save_lm_models(path: str, models: Dict[str, CharTrigramLM]) -> str:
    path = _npz_path(path)
    arrays = {"kind": "charlm", "langs": np.asarray(sorted(models))}
    for lang, m in models.items():
        for part in ("uni", "bi", "tri"):
            arrays[f"{lang}__{part}_keys"] = getattr(m, f"{part}_keys")
            arrays[f"{lang}__{part}_cnt"] = getattr(m, f"{part}_cnt")
    np.savez_compressed(path, **arrays)
    return path


def load_model(path: str):
    """Load any artifact written by the savers above; returns
    ``("ftquality", W)`` / ``("ftlang", (W, langs))`` / ``("charlm",
    {lang: CharTrigramLM})``."""
    z = np.load(path, allow_pickle=False)
    kind = str(z["kind"])
    if kind == "ftquality":
        return kind, z["W"]
    if kind == "ftlang":
        return kind, (z["W"], tuple(str(s) for s in z["langs"]))
    if kind == "charlm":
        models = {}
        for lang in (str(s) for s in z["langs"]):
            models[lang] = CharTrigramLM.from_counts(
                (z[f"{lang}__uni_keys"], z[f"{lang}__uni_cnt"]),
                (z[f"{lang}__bi_keys"], z[f"{lang}__bi_cnt"]),
                (z[f"{lang}__tri_keys"], z[f"{lang}__tri_cnt"]),
            )
        return kind, models
    raise ValueError(f"unknown model artifact kind {kind!r} in {path}")
