"""fastText-architecture language identification (hashed char n-grams).

The north rule asks for "fastText language-ID ... run inside vectorized
pandas/Arrow UDFs (models broadcast to executors, batched inference)". The
fastText wheel (and any pretrained ``lid.176.bin``) is unavailable here, so
this module implements the same *architecture* end to end with embedded
public data only:

- features: character n-grams (sizes ``NGRAM_SIZES``) of the lowercased
  text, hashed with FNV-1a 32-bit into ``N_BUCKETS`` buckets — fastText's
  hashing-trick feature space;
- model: a dense ``(N_BUCKETS, n_langs)`` float64 weight matrix of
  per-bucket log-likelihoods, trained as a multinomial Naive Bayes over a
  deterministic synthetic corpus generated from the embedded per-language
  profiles (``langprofiles.STOPWORDS`` / ``CONTENT_WORDS`` — the same
  vocabulary the test corpus is built from, so no external data enters);
  NB training is pure integer counting + one vectorized ``np.log``, hence
  bit-reproducible;
- inference: per document, bucket counts are assembled once and scored with
  a single ``counts @ W[buckets]`` matrix product, softmax for confidence,
  argmax (first-max tie-break) for the prediction. Documents producing zero
  n-grams predict ``("und", 0.0)``.

The classifier complements (does not replace) ``core.langid``: ``langid`` is
the pinned stopword/charset evidence spec with a full DuckDB-SQL oracle;
this model is the fastText-parity path, value-gated through a golden parquet
(``testing.goldens.golden_ftlang``) because a trained weight matrix is not
re-derivable in ANSI SQL.

Determinism contract: the trained matrix depends only on this module's
source (seeded ``random.Random``, integer counts), and the oracle and the
Spark UDF score through the SAME ``predict`` function with bit-identical
weight arrays (broadcast pickling preserves float64 bits), so Spark output
equals the golden bit-for-bit.
"""

from __future__ import annotations

import random
from collections import Counter
from typing import Dict, Iterable, List, Optional, Tuple

import numpy as np

from .casefold import simple_lower
from .langprofiles import CHAR_BASED_LANGS, CONTENT_WORDS, LANGS, STOPWORDS

NGRAM_SIZES = (2, 3)
N_BUCKETS = 1 << 17  # ~13k distinct training grams -> ~10% collision rate;
# the (N_BUCKETS x 10) float64 matrix is 10.5 MB — small broadcast
ALPHA = 0.5  # NB Laplace smoothing
# und gate: if less than this fraction of the document's BIGRAM occurrences
# hit a bucket seen in training, the text carries no language evidence and
# whatever lands is hash-collision noise -> "und". Measured on bigrams only
# because the trigram space of the char-based languages is too large to
# saturate in training (zh trigram seen-fraction ~0.5 on genuine text, while
# its bigram fraction is >=0.78; junk text stays <=0.67 on bigrams).
MIN_EVIDENCE_FRACTION = 0.6
EVIDENCE_NGRAM = 2
TRAIN_SENTENCES_PER_LANG = 240
# zh's embedded vocabulary is single characters, so its synthetic text is
# near-uniform over ~80^2 bigrams; 10x the sentence volume (~24k chars)
# covers ~97% of that bigram space (coupon collector: 1-exp(-24000/6400)),
# keeping held-out zh above the OOV evidence threshold. Other languages
# reuse multi-char words, so their gram space saturates at the base volume.
TRAIN_SENTENCES_OVERRIDE = {"zh": 2400}
TRAIN_SEED = 20240811  # frozen — changing it changes golden fixtures

_FNV_OFFSET = 0x811C9DC5
_FNV_PRIME = 0x01000193
_MASK32 = 0xFFFFFFFF


def fnv1a_bucket(gram: str) -> int:
    """FNV-1a 32-bit over the UTF-8 bytes, mod ``N_BUCKETS``."""
    h = _FNV_OFFSET
    for b in gram.encode("utf-8"):
        h = ((h ^ b) * _FNV_PRIME) & _MASK32
    return h % N_BUCKETS


# gram -> bucket memo. Grams repeat massively across documents; the cap
# bounds executor memory against adversarial gram diversity (at cap the map
# stops growing and cold grams just rehash).
_BUCKET_CACHE: Dict[str, int] = {}
_BUCKET_CACHE_CAP = 1_000_000


def _bucket(gram: str) -> int:
    b = _BUCKET_CACHE.get(gram)
    if b is None:
        b = fnv1a_bucket(gram)
        if len(_BUCKET_CACHE) < _BUCKET_CACHE_CAP:
            _BUCKET_CACHE[gram] = b
    return b


def bucket_counts(
    text: str, sizes: Tuple[int, ...] = NGRAM_SIZES, pre_lowered: bool = False
) -> Counter:
    """Hashed n-gram bag of one document (lowercased, spaces included —
    spaces at gram edges encode word boundaries, fastText-style).
    ``pre_lowered=True`` skips the casefold pass — for callers that lower
    ONCE and score several n-gram sizes (predict); semantics identical."""
    out: Counter = Counter()
    t = text if pre_lowered else simple_lower(text)  # İ rule (core.casefold)
    n_chars = len(t)
    for n in sizes:
        for i in range(n_chars - n + 1):
            out[_bucket(t[i : i + n])] += 1
    return out


# ---------------------------------------------------------------------------
# training (deterministic synthetic corpus from the embedded profiles)
# ---------------------------------------------------------------------------


def _train_sentence(rng: random.Random, lang: str) -> str:
    """One synthetic training sentence: content vocabulary mixed with
    stopwords (Latin-script languages) at the same ~40% rate the corpus
    generator uses; char-based languages concatenate without separators."""
    stop = STOPWORDS.get(lang, [])
    content = CONTENT_WORDS[lang]
    n_words = rng.randint(6, 14)
    words = [
        rng.choice(stop) if stop and rng.random() < 0.4 else rng.choice(content)
        for _ in range(n_words)
    ]
    return ("" if lang in CHAR_BASED_LANGS else " ").join(words)


def nb_loglik(counts: np.ndarray) -> np.ndarray:
    """Laplace-smoothed NB log-likelihood matrix from an integer count
    matrix ``(N_BUCKETS, n_classes)``. Rows never seen by ANY class are
    zeroed: out-of-vocabulary grams then contribute identically to every
    class (plain NB smoothing would bias OOV text toward the class with the
    smallest training mass — e.g. all-digit text scoring as zh). Seen rows
    are strictly negative (log of a probability < 1), so "row is all zeros"
    is an unambiguous OOV marker.

    This is the ONE spec for turning counts into weights — the driver-side
    trainers here and in ``core.ftquality`` and the distributed trainer
    (``operators.train``) all call it, so a distributed count matrix equal
    to the driver's yields a bit-identical model (integer sums are
    order-free; the float ops below see the same inputs)."""
    smoothed = counts.astype(np.float64) + ALPHA
    totals = smoothed.sum(axis=0)
    W = np.log(smoothed / totals)
    W[counts.sum(axis=1) == 0, :] = 0.0
    return W


def train_model() -> Tuple[np.ndarray, Tuple[str, ...]]:
    """Train the NB weight matrix; returns ``(W, langs)`` with
    ``W[bucket, lang] = log p(bucket | lang)`` under Laplace smoothing for
    buckets seen in training (see ``nb_loglik`` for the OOV-row contract;
    a document with only zeroed rows is reported ``und`` by ``predict``)."""
    counts = np.zeros((N_BUCKETS, len(LANGS)), dtype=np.int64)
    for li, lang in enumerate(LANGS):
        rng = random.Random(f"{TRAIN_SEED}:{lang}")
        n_sent = TRAIN_SENTENCES_OVERRIDE.get(lang, TRAIN_SENTENCES_PER_LANG)
        for _ in range(n_sent):
            for bucket, c in bucket_counts(_train_sentence(rng, lang)).items():
                counts[bucket, li] += c
    return nb_loglik(counts), tuple(LANGS)


_MODEL: Optional[Tuple[np.ndarray, Tuple[str, ...]]] = None


def model() -> Tuple[np.ndarray, Tuple[str, ...]]:
    """Process-wide trained model singleton (driver trains once, then
    broadcasts the arrays; executors receiving a broadcast never train)."""
    global _MODEL
    if _MODEL is None:
        _MODEL = train_model()
    return _MODEL


# ---------------------------------------------------------------------------
# inference
# ---------------------------------------------------------------------------


def predict(
    text: str, m: Optional[Tuple[np.ndarray, Tuple[str, ...]]] = None
) -> Tuple[str, float]:
    """One document -> (lang, softmax confidence). The ONLY scoring path —
    the golden oracle and the Spark UDF both call this, so their float
    behavior is identical by construction."""
    if not text:
        return "und", 0.0
    # hash each n-gram size ONCE: the bag is the sum of per-size bags, and
    # the evidence gate reuses the bigram bag instead of re-hashing every
    # bigram of the document (this is the corpus-wide UDF hot path)
    low = simple_lower(text)  # fold ONCE, not once per n-gram size
    per_size = {n: bucket_counts(low, (n,), pre_lowered=True) for n in NGRAM_SIZES}
    bag: Counter = Counter()
    for b in per_size.values():
        bag.update(b)
    if not bag:
        return "und", 0.0
    W, langs = m if m is not None else model()

    def _arrays(b: Counter):
        items = sorted(b.items())
        i = np.fromiter((k for k, _ in items), dtype=np.int64, count=len(items))
        c = np.fromiter((v for _, v in items), dtype=np.float64, count=len(items))
        return i, c

    evidence = per_size.get(EVIDENCE_NGRAM)
    if evidence is None:
        evidence = bucket_counts(low, (EVIDENCE_NGRAM,), pre_lowered=True)
    bi_idx, bi_cnt = _arrays(evidence)
    if bi_idx.size == 0:
        return "und", 0.0
    bi_seen = W[bi_idx].any(axis=1)
    if float(bi_cnt[bi_seen].sum()) < MIN_EVIDENCE_FRACTION * float(bi_cnt.sum()):
        return "und", 0.0  # bigram occurrences mostly OOV -> no evidence

    idx, cnt = _arrays(bag)
    scores = cnt @ W[idx]
    shifted = np.exp(scores - scores.max())
    probs = shifted / shifted.sum()
    best = int(np.argmax(scores))
    return langs[best], float(probs[best])


def predict_many(
    texts: Iterable[Optional[str]],
    m: Optional[Tuple[np.ndarray, Tuple[str, ...]]] = None,
) -> List[Tuple[str, float]]:
    """Batch helper (one model resolve for the whole batch)."""
    mm = m if m is not None else model()
    return [predict(t or "", mm) for t in texts]
