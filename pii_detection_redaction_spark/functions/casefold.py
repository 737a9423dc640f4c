"""JVM arm of the cross-engine lowering spec (see ``core.casefold``).

``simple_lower_col`` = DuckDB's one-char ``lower()`` as a pure JVM
expression: translate İ→i, then — only when a pinned late-Unicode capital
is present (``rlike`` prefilter, so the common path is a single ``lower``)
— split around the pinned class, lower the segments, and stitch the pinned
characters back unchanged. Java's own ``lower`` would case-fold them
(its Unicode tables are NEWER than DuckDB's), and no JVM primitive can
selectively exempt characters from ``lower``, hence the split/rejoin; it
is ~6 higher-order expression nodes, stays whole-stage-codegen-eligible,
and costs nothing on text without those characters.

Equality with ``core.casefold.simple_lower`` and DuckDB ``lower()`` over
EVERY codepoint is pinned by
``tests/test_casefold.py::test_simple_lower_equals_duckdb_on_full_domain``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..core.casefold import I_DOT, PINNED_CLASS


def simple_lower_col(col) -> Column:
    c = F.translate(col, I_DOT, "i")
    pieces = F.split(c, PINNED_CLASS)          # segments between pinned chars
    kept = F.regexp_extract_all(c, F.lit(PINNED_CLASS), 0)
    stitched = F.array_join(
        F.transform(
            # one slot per segment: lower(segment) + (pinned char | '')
            F.sequence(F.lit(0), F.size(pieces) - 1),
            lambda i: F.concat(
                F.lower(F.get(pieces, i)),
                F.coalesce(F.get(kept, i), F.lit("")),
            ),
        ),
        "",
    )
    return F.when(c.rlike(PINNED_CLASS), stitched).otherwise(F.lower(c))


__all__ = ["simple_lower_col"]
