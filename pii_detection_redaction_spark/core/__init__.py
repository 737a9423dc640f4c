"""Pure-Python semantics core (no Spark imports).

This package IS the specification: the reference repo ships no tests or
fixtures (SURVEY.md §5.1), and its ML dependencies (presidio, spaCy) are not
installed here, so the reference's recognizer/scrub semantics are pinned by
this deterministic reimplementation. Golden labels for the Spark pipeline are
produced by these functions; the Spark UDFs in ``..functions`` call the same
code so Spark output is byte-identical to the oracle by construction, and the
test suite verifies that independently on fixed corpora.
"""

from .spans import Detection  # noqa: F401
from .recognizers import analyze, default_bank, RecognizerSpec  # noqa: F401
from .chunker import chunk_text, analyze_long_text  # noqa: F401
from .relationships import (  # noqa: F401
    Owner,
    Assignment,
    assign_relationships,
    mask_with_relationships,
)
from .scrub import (  # noqa: F401
    select_nonoverlapping,
    replace_with_labels,
    mask_spans,
    scrub_document,
)
