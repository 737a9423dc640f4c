"""HTML -> text extraction (the web-text analog of the reference's
PDF/image text-extraction stage, ``pdf_redactor/analyzer.py:29-59``).

The input-hint invariant is *byte-identical extracted text per url*: pages
carry ``html:binary`` produced by wrapping each text line in ``<p>`` with
HTML-escaping (see ``testing.corpus.render_html``), and this extractor is its
exact inverse. It also degrades reasonably on generic HTML (tag-stripping
fallback) so real-corpus pages don't crash the pipeline.
"""

from __future__ import annotations

import html as _html
import re
from typing import Optional

_P_RE = re.compile(r"<p>(.*?)</p>", re.DOTALL)
_TAG_RE = re.compile(r"<[^>]+>")


def extract_text(html_bytes: Optional[bytes]) -> str:
    """Extract document text from page HTML bytes (UTF-8)."""
    if not html_bytes:
        return ""
    raw = html_bytes.decode("utf-8", errors="replace")
    paras = _P_RE.findall(raw)
    if paras:
        return "\n".join(_html.unescape(p) for p in paras)
    # Fallback for arbitrary HTML: strip tags, unescape, collapse blank runs.
    body = _TAG_RE.sub(" ", raw)
    body = _html.unescape(body)
    return re.sub(r"[ \t]+", " ", body).strip()
