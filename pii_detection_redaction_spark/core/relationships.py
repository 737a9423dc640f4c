"""Entity-ownership model and relationship-aware masking.

Behavioral contract re-derived from the reference's ownership semantics
(``text_detector/relationships.py``, cited per rule below) — the flagship
byte-identical transform — extended to the full person-type taxonomy
(PERSON_WITH_TITLE / PERSON_AFTER_GREETING / REPEATED_NAME, reference
``entity_mapping/entity_config.py:20-23``), which the reference's masker
never sees because its text path only emits spaCy PERSON:

- every person-type detection becomes a numbered *owner* ``1..N`` in
  first-appearance order (``relationships.py:55-63``; our extension treats
  all person types uniformly — a repeated bare name owns entities exactly
  like its titled first occurrence);
- each non-person entity is assigned to at most one owner by three rules in
  priority order:
  (1) nearest person on the entity's own text line, distance =
      ``|owner.start - entity.start|`` (``:80-90``; line spans built from
      ``splitlines(keepends)`` with a whole-text fallback, ``:24-33``);
  (2) for EMAIL_ADDRESS only: the first owner whose name yields a token of
      >= 3 chars contained in the email's normalized local part
      (``:36-43,92-99``);
  (3) the globally nearest owner by start-offset distance (``:45-48,101-102``);
- mask composition (``:109-155``): person span -> ``PERSON_{i}``; owned
  entity -> ``<TYPE_PERSON_{i}>``; unowned -> ``<TYPE>``; a *generic*
  ``<PHONE_NUMBER>`` replacement (unowned only — owned labels don't contain
  the exact token, ``:142-145``) becomes ``<PHONE_NUMBER_{'*' x n_digits}>``;
- replacements are applied right-to-left (``:149-153``) so earlier offsets
  stay valid; with overlapping spans this splicing order is semantics-bearing
  and is reproduced exactly.

Everything here is per-document: in Spark these functions run inside one
Arrow-batched UDF call and never cross document boundaries (no join, no
shuffle).
"""

from __future__ import annotations

import re
from bisect import bisect_right
from dataclasses import dataclass
from itertools import accumulate
from typing import Dict, List, Optional, Sequence, Tuple

from .entities import PERSON_TYPES
from .spans import Detection, splice_spans

_TOKEN_SPLIT_RE = re.compile(r"[^A-Za-z0-9]+")
_NON_ALNUM_RE = re.compile(r"[^a-z0-9]+")
_NON_DIGIT_RE = re.compile(r"\D")


@dataclass
class Owner:
    id: int
    span: Tuple[int, int]
    name: str


@dataclass
class Assignment:
    result: Detection
    owner_id: Optional[int]


def _line_starts_ends(text: str) -> Tuple[List[int], List[int]]:
    """Parallel (starts, ends) arrays of the half-open line segments of
    ``text`` (keepends split); a break-free text is one whole-text segment
    (reference ``relationships.py:24-33``)."""
    lengths = [len(seg) for seg in text.splitlines(True)]
    if not lengths:
        return [0], [len(text)]
    ends = list(accumulate(lengths))
    return [0] + ends[:-1], ends


def _owner_name_tokens(name: str) -> List[str]:
    # alnum runs of the owner name (reference ``:41-43``)
    return [tok for tok in _TOKEN_SPLIT_RE.split(name) if tok]


def _email_matches_owner(local_part: str, tokens: Sequence[str]) -> bool:
    # >=3-char name token contained in the lowercased/stripped local part
    # (reference ``:36-38``)
    squashed = _NON_ALNUM_RE.sub("", local_part.lower())
    return any(len(tok) >= 3 and tok.lower() in squashed for tok in tokens)


def _closest_owner(owners: Sequence[Owner], position: int) -> Optional[int]:
    # min-distance scan; the earliest owner wins ties because the scan is
    # in id order and strict `<` (reference ``:45-48`` min() tie behavior)
    best_id, best_dist = None, None
    for o in owners:
        dist = abs(o.span[0] - position)
        if best_dist is None or dist < best_dist:
            best_id, best_dist = o.id, dist
    return best_id


def assign_relationships(
    text: str, results: Sequence[Detection]
) -> Tuple[List[Owner], List[Assignment]]:
    """Resolve owners and per-detection owner assignments (rules 1-3 above)."""
    owners = [
        Owner(k + 1, (d.start, d.end), text[d.start : d.end])
        for k, d in enumerate(r for r in results if r.entity_type in PERSON_TYPES)
    ]
    tokens_of: Dict[int, List[str]] = {
        o.id: _owner_name_tokens(o.name) for o in owners
    }
    starts, ends = _line_starts_ends(text)

    assignments: List[Assignment] = []
    for det in results:
        if det.entity_type in PERSON_TYPES:
            assignments.append(Assignment(det, None))
            continue

        chosen: Optional[int] = None

        # rule 1 — same-line nearest person. bisect locates the unique line
        # whose [start, end) contains det.start; the detection must also end
        # within it (a break-spanning span matches no line).
        li = bisect_right(starts, det.start) - 1
        if 0 <= li < len(ends) and det.end <= ends[li]:
            ls, le = starts[li], ends[li]
            in_line = [o for o in owners if o.span[0] >= ls and o.span[1] <= le]
            if in_line:
                chosen = _closest_owner(in_line, det.start)

        # rule 2 — email local-part vs owner-name tokens, first owner wins
        if chosen is None and det.entity_type == "EMAIL_ADDRESS":
            value = text[det.start : det.end]
            if "@" in value:
                local = value.split("@", 1)[0]
                chosen = next(
                    (o.id for o in owners
                     if _email_matches_owner(local, tokens_of[o.id])),
                    None,
                )

        # rule 3 — global nearest fallback
        if chosen is None:
            chosen = _closest_owner(owners, det.start)

        assignments.append(Assignment(det, chosen))

    return owners, assignments


def _person_label_index(owners: Sequence[Owner]) -> Dict[Tuple[int, int], int]:
    """span -> owner id, FIRST owner winning duplicate spans (matches the
    reference's first-match linear scan at ``:127-133``)."""
    index: Dict[Tuple[int, int], int] = {}
    for o in owners:
        index.setdefault(o.span, o.id)
    return index


def mask_with_relationships(text: str, results: Sequence[Detection]) -> str:
    """Apply the relationship mask composition (module doc) to ``text``."""
    owners, assignments = assign_relationships(text, results)
    span_owner = _person_label_index(owners)

    pieces: List[Tuple[int, int, str]] = []
    for a in assignments:
        det, span = a.result, (a.result.start, a.result.end)
        if det.entity_type in PERSON_TYPES:
            oid = span_owner.get(span)
            label = f"PERSON_{oid}" if oid is not None else "<PERSON>"
            pieces.append((span[0], span[1], label))
            continue

        label = (
            f"<{det.entity_type}_PERSON_{a.owner_id}>"
            if a.owner_id is not None
            else f"<{det.entity_type}>"
        )
        if det.entity_type == "PHONE_NUMBER":
            n_digits = len(_NON_DIGIT_RE.sub("", text[span[0] : span[1]]))
            # exact-token replace: only the generic unowned label matches,
            # owned labels pass through untouched (reference ``:142-145``)
            label = label.replace(
                "<PHONE_NUMBER>", f"<PHONE_NUMBER_{'*' * n_digits}>"
            )
        pieces.append((span[0], span[1], label))

    # right-to-left splice — the one shared spelling (core.spans.splice_spans)
    return splice_spans(text, pieces)
