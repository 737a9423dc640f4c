"""Sliding-window chunking + cross-chunk arg-max dedup.

Reproduces the reference's long-text analysis exactly:

- ``chunk_text``: overlapping windows, default size=5000 / overlap=300
  (reference ``text_detector/chunker.py:9-26``; CLI defaults
  ``text_detector/cli.py:38-50``). First chunk is unshifted
  (``start = i if i == 0 else max(0, i - overlap)``).
- ``analyze_long_text``: per-chunk analyze → min-score filter → offset
  globalization → arg-max dedup keyed ``(global_start, global_end,
  entity_type)`` keeping the highest score → sort by
  ``(start, end, entity_type)`` (reference ``text_detector/chunker.py:29-68``).

In Spark this runs *inside* the vectorized detect UDF — chunking is a
per-document algorithm whose parameters are semantics-bearing (they determine
which spans exist), so it never becomes a shuffle.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Optional, Sequence, Tuple

from .entities import expand_entities
from .recognizers import (
    RecognizerSpec,
    analyze,
    propagate_repeated_names,
    resolve_conflicts,
)
from .spans import Detection

DEFAULT_CHUNK_SIZE = 5000
DEFAULT_CHUNK_OVERLAP = 300


def chunk_text(
    text: str,
    size: int = DEFAULT_CHUNK_SIZE,
    overlap: int = DEFAULT_CHUNK_OVERLAP,
) -> Iterable[Tuple[int, str]]:
    if size <= 0:
        raise ValueError("size must be > 0")
    if overlap < 0:
        raise ValueError("overlap must be >= 0")
    n = len(text)
    i = 0
    while i < n:
        start = i if i == 0 else max(0, i - overlap)
        end = min(n, i + size)
        yield start, text[start:end]
        i += size


def analyze_long_text(
    text: str,
    size: int = DEFAULT_CHUNK_SIZE,
    overlap: int = DEFAULT_CHUNK_OVERLAP,
    min_score: float = 0.0,
    entities: Optional[Sequence[str]] = None,
    bank: Optional[Sequence[RecognizerSpec]] = None,
    scans=None,
) -> List[Detection]:
    if not text:
        return []
    if len(text) <= size:
        # Single chunk — identical result, skip the window machinery. The
        # optional whole-document ScanBundle (core.scanvec) only applies
        # here: chunk-local offsets in the multi-chunk branch don't line up
        # with document-level candidate positions, so that path keeps the
        # per-chunk lazy scans.
        dets = analyze(text, entities=entities, min_score=min_score,
                       bank=bank, scans=scans)
    else:
        best: Dict[Tuple[int, int, str], Detection] = {}
        for start_offset, chunk in chunk_text(text, size=size, overlap=overlap):
            for d in analyze(chunk, entities=entities, min_score=min_score, bank=bank):
                gs, ge = start_offset + d.start, start_offset + d.end
                key = (gs, ge, d.entity_type)
                cur = best.get(key)
                if cur is None or d.score > cur.score:
                    best[key] = Detection(d.entity_type, gs, ge, d.score, d.pattern_name)

        # Chunk overlap can surface span pairs that single-chunk conflict
        # resolution would have collapsed (a boundary-truncated match inside a
        # full match seen by the next chunk); re-resolve globally. NOT fully
        # chunking-invariant: a pattern whose lookahead/anchor is cut at a
        # chunk END can fire with truncated right context (e.g. NAME_TITLE's
        # negative lookahead passing at end-of-chunk), producing a span
        # whole-text analyze would not — the REFERENCE chunker has exactly
        # the same artifact (chunker.py:29-68 scans truncated chunks and
        # merges by (start, end, type) key), so this is behavior parity,
        # not a defect to engineer away.
        dets = resolve_conflicts(list(best.values()))

    # Document-level repeated-name propagation (recognizers.
    # propagate_repeated_names): runs over the WHOLE text, so a name detected
    # in one chunk masks its bare occurrences in every other chunk. Gated on
    # the (group-expanded) entity request like any other type.
    ents = expand_entities(entities)
    if ents is None or "REPEATED_NAME" in ents:
        extra = propagate_repeated_names(text, dets, min_score=min_score)
        if extra:
            dets = sorted(dets + extra, key=lambda d: d.sort_key())
    return dets
