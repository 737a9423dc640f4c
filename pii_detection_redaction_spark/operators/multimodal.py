"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a metadata struct,
processed by Arrow-batched ``mapInPandas`` stages. The codec libraries are
not installed in this container, so the *decode kernels* are stubbed behind
``DecodeUnavailable`` with a deterministic fake used by tests — but the
Spark-side contract (schemas, batch iteration, partitioning, UDF signatures)
is real and tested: swapping in a real decoder changes one function.

This mirrors how the reference treats images (PIL bytes in, boxes out —
``image_redactor/redactor.py:43-93``) without porting its visual pipeline,
which SURVEY.md §2.1 scopes out for the web-text rebuild.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_TYPE = T.StructType(
    [
        T.StructField("media_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload_md5", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


class DecodeUnavailable(NotImplementedError):
    """Raised by real decode kernels: codec libs are not in this container."""


def decode_image(payload: bytes):  # pragma: no cover - by design
    raise DecodeUnavailable(
        "image decode requires PIL/libjpeg — not installed; use "
        "fake_feature_kernel for deterministic plumbing tests"
    )


# Fake-kernel spec constants — consumed by the kernel AND injected into the
# DuckDB oracle SQL (plans/oracles.py _multimodal_sql); never fork them.
FAKE_DIM_MAX = 8  # md5 yields 16 bytes = 8 u16 components
U16_SCALE = 65535.0


def _features_from_digest(h: bytes, dim: int) -> list:
    vals = [
        int.from_bytes(h[2 * i : 2 * i + 2], "little") / U16_SCALE
        for i in range(dim)
    ]
    norm = sum(v * v for v in vals) ** 0.5 or 1.0
    return [float(v / norm) for v in vals]


def fake_feature_kernel(payload: bytes, dim: int = FAKE_DIM_MAX) -> list:
    """Deterministic stand-in for decode+embed: md5-derived unit-norm vector.
    Stable across executors/runs — lets tests pin exact outputs. dim is
    capped at FAKE_DIM_MAX: md5 has exactly 8 u16 lanes, and silently
    zero-padding beyond them would hand downstream cosine ops degenerate
    vectors."""
    if not 1 <= dim <= FAKE_DIM_MAX:
        raise ValueError(f"dim must be in [1, {FAKE_DIM_MAX}], got {dim}")
    return _features_from_digest(hashlib.md5(payload or b"").digest(), dim)


def extract_features(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    dim: int = FAKE_DIM_MAX,
) -> DataFrame:
    """mapInPandas feature extraction: iterates Arrow batches, never
    materializes the whole partition; output schema is fixed
    (FEATURE_SCHEMA). Partitioning is inherited — payloads never shuffle.
    Each payload is hashed ONCE; the hex id and the feature vector both
    derive from that digest."""
    if not 1 <= dim <= FAKE_DIM_MAX:
        raise ValueError(f"dim must be in [1, {FAKE_DIM_MAX}], got {dim}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            digests = [hashlib.md5(p or b"").digest() for p in payloads]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "payload_md5": [d.hex() for d in digests],
                    "n_bytes": [len(p or b"") for p in payloads],
                    "feature": [_features_from_digest(d, dim) for d in digests],
                }
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)


# shared defaults for the catalog query AND the DuckDB oracle (CLAUDE.md
# one-spec rule: the oracle SQL interpolates THESE, never bare literals)
FRAME_EVERY_N = 30
RESIZE_MAX_DIM = 512


def frame_sample_plan(
    df: DataFrame, meta_col: str = "meta", every_n: int = FRAME_EVERY_N
) -> DataFrame:
    """Declarative frame-sampling plan: explodes frame indices 0, n, 2n, ...
    from metadata without touching payload bytes (JVM-side sequence)."""
    n_frames = F.coalesce(F.col(f"{meta_col}.n_frames"), F.lit(0))
    idx = F.sequence(
        F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n)
    )
    return df.withColumn(
        "frame_idx", F.explode(F.when(n_frames > 0, idx).otherwise(F.array()))
    )


def resize_image(payload: bytes, width: int, height: int):  # pragma: no cover
    raise DecodeUnavailable(
        "image resize requires PIL — not installed; resize_plan computes the "
        "target geometry JVM-side and this kernel is the one swap point"
    )


def resize_plan(
    df: DataFrame,
    max_w: int = RESIZE_MAX_DIM,
    max_h: int = RESIZE_MAX_DIM,
    meta_col: str = "meta",
) -> DataFrame:
    """Aspect-preserving fit-resize geometry, entirely JVM-side from the
    metadata struct (payload bytes untouched — at 100 TB the plan columns
    are computed during the scan and only sampled frames ever reach the
    stubbed ``resize_image`` kernel):

    scale = min(1, max_w/width, max_h/height)  (never upscale)
    target = max(1, round(dim * scale))        (half-up, 1px floor)

    NULL/non-positive source dims yield NULL targets (honest lineage, no
    fabricated geometry)."""
    w = F.col(f"{meta_col}.width").cast("double")
    h = F.col(f"{meta_col}.height").cast("double")
    ok = w.isNotNull() & h.isNotNull() & (w > 0) & (h > 0)
    scale = F.least(F.lit(1.0), F.lit(float(max_w)) / w, F.lit(float(max_h)) / h)
    tw = F.greatest(F.round(w * scale).cast("int"), F.lit(1))
    th = F.greatest(F.round(h * scale).cast("int"), F.lit(1))
    return (
        df.withColumn("resize_scale", F.when(ok, F.round(scale, 6)))
        .withColumn("target_w", F.when(ok, tw))
        .withColumn("target_h", F.when(ok, th))
    )
