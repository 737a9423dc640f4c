"""Filesystem-name hygiene for file-per-document sinks.

Reference parity: ``interface/helpers.py:42-46`` replaces the characters
Windows/POSIX reject in filenames with underscores; same contract here for
any sink that derives file names from urls/doc ids.
"""

from __future__ import annotations

import re

_UNSAFE_RE = re.compile(r'[<>:"/\\|?*]')


def safe_filename(name: str) -> str:
    """Replace ``< > : " / \\ | ? *`` with ``_`` (reference C19)."""
    return _UNSAFE_RE.sub("_", name)
