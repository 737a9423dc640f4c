"""Relationship-aware masking — the flagship byte-identical transform.

Faithful re-expression of the reference's entity-ownership model and masking
composition (``text_detector/relationships.py``):

- PERSON detections become numbered owners 1..N in first-appearance order
  (``relationships.py:55-63``);
- every non-PERSON entity is assigned to at most one owner by, in order:
  (J1) nearest PERSON on the same text line (``:80-90``),
  (J2) email local-part vs normalized person-name tokens, >= 3 chars,
       substring containment (``:36-43,92-99``),
  (J3) global nearest PERSON by |owner.start - entity.start| (``:45-48,101-102``);
- masking (``:109-155``): PERSON -> ``PERSON_{i}``; owned entity ->
  ``<TYPE_PERSON_{i}>``; unowned -> ``<TYPE>``; generic PHONE_NUMBER special
  case replaces ``<PHONE_NUMBER>`` with ``<PHONE_NUMBER_{'*' x len(digits)}>``
  (exact-string replace, so owned phones keep their owner label — ``:142-145``);
- replacements applied right-to-left so earlier offsets stay valid (``:149-153``).

These are per-document computations: in Spark they live inside one vectorized
UDF call and never cross document boundaries (no join, no shuffle).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

from .spans import Detection


@dataclass
class Owner:
    id: int
    span: Tuple[int, int]
    name: str


@dataclass
class Assignment:
    result: Detection
    owner_id: Optional[int]


def _split_lines_with_span(text: str) -> List[Tuple[int, int, str]]:
    # reference relationships.py:24-33
    lines = []
    i = 0
    for segment in text.splitlines(True):
        lines.append((i, i + len(segment), segment))
        i += len(segment)
    return lines if lines else [(0, len(text), text)]


def _extract_person_tokens(name: str) -> List[str]:
    # reference relationships.py:41-43
    return [t for t in re.split(r"[^A-Za-z0-9]+", name) if t]


def _contains_token(local_part: str, tokens: List[str]) -> bool:
    # reference relationships.py:36-38
    lp = re.sub(r"[^a-z0-9]+", "", local_part.lower())
    return any(t for t in tokens if len(t) >= 3 and t.lower() in lp)


def _nearest_person_by_distance(owners: List[Owner], position: int) -> Optional[int]:
    # reference relationships.py:45-48
    if not owners:
        return None
    return min(owners, key=lambda o: abs(o.span[0] - position)).id


def assign_relationships(
    text: str, results: Sequence[Detection]
) -> Tuple[List[Owner], List[Assignment]]:
    owners: List[Owner] = []
    for r in results:
        if r.entity_type == "PERSON":
            owners.append(Owner(len(owners) + 1, (r.start, r.end), text[r.start : r.end]))

    lines = _split_lines_with_span(text)
    person_tokens: Dict[int, List[str]] = {
        o.id: _extract_person_tokens(o.name) for o in owners
    }

    assignments: List[Assignment] = []
    for r in results:
        if r.entity_type == "PERSON":
            assignments.append(Assignment(r, None))
            continue

        owner_id: Optional[int] = None
        for ls, lc, _ in lines:
            if r.start >= ls and r.end <= lc:
                same_line = [o for o in owners if o.span[0] >= ls and o.span[1] <= lc]
                if same_line:
                    owner_id = min(same_line, key=lambda o: abs(o.span[0] - r.start)).id
                break

        if owner_id is None and r.entity_type == "EMAIL_ADDRESS":
            value = text[r.start : r.end]
            if "@" in value:
                local_part = value.split("@", 1)[0]
                for o in owners:
                    if _contains_token(local_part, person_tokens[o.id]):
                        owner_id = o.id
                        break

        if owner_id is None:
            owner_id = _nearest_person_by_distance(owners, r.start)

        assignments.append(Assignment(r, owner_id))

    return owners, assignments


def mask_with_relationships(text: str, results: Sequence[Detection]) -> str:
    owners, assignments = assign_relationships(text, results)
    person_labels: Dict[int, str] = {o.id: f"PERSON_{o.id}" for o in owners}

    repl_spans: List[Tuple[int, int, str]] = []
    for a in assignments:
        r = a.result
        ct = r.entity_type
        original = text[r.start : r.end]

        if ct == "PERSON":
            owner_id = None
            for o in owners:
                if o.span == (r.start, r.end):
                    owner_id = o.id
                    break
            repl_spans.append((r.start, r.end, person_labels.get(owner_id, "<PERSON>")))
            continue

        if a.owner_id is not None:
            replacement = f"<{ct}_PERSON_{a.owner_id}>"
        else:
            replacement = f"<{ct}>"

        if ct == "PHONE_NUMBER":
            digits = re.sub(r"\D", "", original)
            replacement = replacement.replace(
                "<PHONE_NUMBER>", f"<PHONE_NUMBER_{'*' * len(digits)}>"
            )

        repl_spans.append((r.start, r.end, replacement))

    repl_spans.sort(key=lambda x: x[0], reverse=True)
    masked = text
    for s, e, rep in repl_spans:
        masked = masked[:s] + rep + masked[e:]
    return masked
