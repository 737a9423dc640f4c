"""fastText-architecture document-quality classifier (hashed char n-grams).

The modern web-pipeline move beyond heuristic rules (DCLM, FineWeb-Edu):
train a cheap fastText-style binary classifier on "good text vs crawl junk"
labels and keep/weight documents by its score. No classifier wheel or
curated label set is available here, so — exactly like ``core.ftlang`` —
this module reproduces the *architecture* with embedded public data only:

- features: the SAME hashed char n-gram space as ``core.ftlang``
  (``bucket_counts`` is imported, not re-implemented);
- supervision: a deterministic synthetic label set. Positives are fluent
  stopword-mixed sentences in every embedded language (the profile
  vocabulary). Negatives are four crawl-junk families mirroring what the
  heuristic rules target: symbol soup, single-token spam runs,
  digit/boilerplate mixes, and one-sentence-repeated-forever pages;
- model: multinomial Naive Bayes over 2 classes -> a dense
  ``(N_BUCKETS, 2)`` log-likelihood matrix, trained by integer counting +
  one vectorized ``np.log`` (bit-reproducible), broadcast to executors;
- inference: one ``counts @ W[buckets]`` product, softmax ->
  ``quality_prob`` = p(good). Documents with no n-grams (empty text) score
  0.0. OOV-only rows are zeroed like ftlang's, so a document with zero
  training evidence splits the softmax evenly (0.5) instead of inheriting
  class-mass bias.

The classifier COMPLEMENTS the frozen heuristic keep/drop (it is not wired
into ``quality_decision`` — the reference-parity decision stays pinned);
it is exposed as its own catalog query, value-gated through a golden
parquet computed by this same ``predict_quality`` function.
"""

from __future__ import annotations

import random
from typing import Iterable, List, Optional

import numpy as np

from .ftlang import N_BUCKETS, bucket_counts
from .langprofiles import CHAR_BASED_LANGS, CONTENT_WORDS, LANGS, STOPWORDS

TRAIN_SEED = 20250815  # frozen — changing it changes golden fixtures
POS_SENTENCES_PER_LANG = 160
NEG_EXAMPLES_PER_FAMILY = 320
_SOUP_CHARS = "#{}<>\\^~|…@%$*()[]=+"

QUALITY_THRESHOLD = 0.5  # label = quality_prob >= threshold


def _pos_sentence(rng: random.Random, lang: str) -> str:
    stop = STOPWORDS.get(lang, [])
    content = CONTENT_WORDS[lang]
    words = [
        rng.choice(stop) if stop and rng.random() < 0.4 else rng.choice(content)
        for _ in range(rng.randint(8, 16))
    ]
    return ("" if lang in CHAR_BASED_LANGS else " ").join(words)


def _neg_example(rng: random.Random, family: int) -> str:
    if family == 0:  # symbol soup
        return "".join(rng.choice(_SOUP_CHARS) for _ in range(rng.randint(40, 160)))
    if family == 1:  # single-token spam run
        tok = rng.choice(CONTENT_WORDS["en"])
        return " ".join([tok] * rng.randint(12, 40))
    if family == 2:  # digit/punct boilerplate
        return " ".join(
            f"{rng.randint(0, 99999)}{rng.choice(['%', '$', '..', '!!', ''])}"
            for _ in range(rng.randint(10, 30))
        )
    # family 3: one sentence repeated forever
    sent = " ".join(rng.choice(CONTENT_WORDS["en"]) for _ in range(6))
    return " ".join([sent] * rng.randint(6, 15))


def train_model() -> np.ndarray:
    """(N_BUCKETS, 2) NB log-likelihood matrix; column 0 = junk, 1 = good.
    Rows unseen by BOTH classes are zeroed (OOV marker, see module doc);
    counts -> weights goes through the shared ``ftlang.nb_loglik`` spec."""
    from .ftlang import nb_loglik

    counts = np.zeros((N_BUCKETS, 2), dtype=np.int64)
    for lang in LANGS:
        rng = random.Random(f"{TRAIN_SEED}:pos:{lang}")
        for _ in range(POS_SENTENCES_PER_LANG):
            for b, c in bucket_counts(_pos_sentence(rng, lang)).items():
                counts[b, 1] += c
    for family in range(4):
        rng = random.Random(f"{TRAIN_SEED}:neg:{family}")
        for _ in range(NEG_EXAMPLES_PER_FAMILY):
            for b, c in bucket_counts(_neg_example(rng, family)).items():
                counts[b, 0] += c
    return nb_loglik(counts)


_MODEL: Optional[np.ndarray] = None


def model() -> np.ndarray:
    """Driver-side trained-model singleton (executors get it by broadcast)."""
    global _MODEL
    if _MODEL is None:
        _MODEL = train_model()
    return _MODEL


def predict_quality(text: str, W: Optional[np.ndarray] = None) -> float:
    """One document -> p(good). The ONLY scoring path — golden oracle and
    Spark UDF both call this, so float behavior is identical."""
    if not text:
        return 0.0
    bag = bucket_counts(text)
    if not bag:
        return 0.0
    if W is None:
        W = model()
    items = sorted(bag.items())
    idx = np.fromiter((k for k, _ in items), dtype=np.int64, count=len(items))
    cnt = np.fromiter((v for _, v in items), dtype=np.float64, count=len(items))
    scores = cnt @ W[idx]
    shifted = np.exp(scores - scores.max())
    probs = shifted / shifted.sum()
    return float(probs[1])


def predict_quality_many(
    texts: Iterable[Optional[str]], W: Optional[np.ndarray] = None
) -> List[float]:
    WW = W if W is not None else model()
    return [predict_quality(t or "", WW) for t in texts]
