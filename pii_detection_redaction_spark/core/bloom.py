"""Portable Bloom-filter spec — single source for Spark, DuckDB, and Python.

Incremental crawl ingestion ("which of today's pages have we EVER seen?")
cannot afford an anti-join of the day's batch against the full history key
set on every run. The standard fix is a Bloom filter over the history: rows
the filter rejects are *definitely new* (no false negatives, by
construction) and skip the join entirely; only the filter's "maybe seen"
rows — true duplicates plus a small false-positive tail — are verified
exactly. The final row set is therefore EXACTLY the anti-join's, which is
what the DuckDB oracle checks (plus the per-row ``bloom_maybe`` verdicts,
re-derived from this same spec in SQL).

Hashing is the repo-wide portable ``core.hashing.hash64`` (== DuckDB
``md5_number_lower``), so every engine computes identical bit positions:
``position_i(key) = hash64("bf" i SEP key) % m``.

Sizing: the catalog constants are deliberately small (m=2048 bits, k=2) so
the false-positive path is actually exercised at test scale (~500 history
keys -> FP rate ~0.17). Production sizing is the textbook formula
(m ~ 1.44 * n * log2(1/fp), k = m/n * ln 2); at 10^10 history keys a single
bitmap no longer broadcasts and the filter shards by key range — the
operator takes (m, k) as parameters and documents that boundary.
"""

from __future__ import annotations

from typing import List

from .hashing import SEP, hash64

BLOOM_M = 2048  # bits (catalog scale — small on purpose, see module doc)
BLOOM_K = 2  # hash functions


def positions(key: str, m: int = BLOOM_M, k: int = BLOOM_K) -> List[int]:
    """The k bit positions of ``key`` — the cross-engine contract."""
    return [hash64(f"bf{i}{SEP}{key}") % m for i in range(k)]


def build_bitmap(keys, m: int = BLOOM_M, k: int = BLOOM_K):
    """Pure-Python reference build (unit tests / small oracles)."""
    bits = bytearray(m)
    for key in keys:
        for p in positions(key, m, k):
            bits[p] = 1
    return bits


def might_contain(key: str, bits, m: int = BLOOM_M, k: int = BLOOM_K) -> bool:
    """Pure-Python reference probe."""
    return all(bits[p] for p in positions(key, m, k))
