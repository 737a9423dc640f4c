"""Minimal WARC/1.0 writer + parser (ISO 28500 subset; response records).

Common Crawl — the canonical 100-TB web-text input — ships as WARC: each
page is a ``response`` record whose block is the raw HTTP response; records
are individually gzipped and concatenated (so a file is streamable without
indexing). This module is the pure-Python spec half: the deterministic
fixture writer (``testing.corpus.ensure_warc_dir``) and the record parser
the Spark source (``sources.warc``) runs inside ``mapInPandas``. Format
knowledge is public (ISO 28500 / IIPC warc-specifications / warcio docs);
no external parser library is used.

Parsing is strict: a malformed record (bad version line, missing
Content-Length, truncated block) raises ``WarcFormatError`` with byte
offset context — at crawl scale a silently-skipped record is corrupt
lineage, so the caller decides whether to quarantine the FILE, never the
parser dropping rows on the floor.
"""

from __future__ import annotations

import gzip
import hashlib
import io
from dataclasses import dataclass
from typing import Iterable, Iterator, List, Optional, Tuple

CRLF = b"\r\n"


class WarcFormatError(ValueError):
    pass


@dataclass
class WarcRecord:
    record_id: str
    warc_type: str
    warc_date: str  # ISO-8601 Z, as written in the header
    target_uri: Optional[str]
    http_status: Optional[int]
    http_content_type: Optional[str]
    payload: bytes  # HTTP body (headers stripped) for response records


def _record_id(url: str, date: str) -> str:
    """Deterministic record id (fixtures must be reproducible byte-for-byte
    — a real crawler uses uuid4 here)."""
    h = hashlib.md5(f"{url}\x1f{date}".encode("utf-8")).hexdigest()
    return f"<urn:md5:{h}>"


def build_response_record(
    url: str, date_iso: str, body: bytes, content_type: str = "text/html; charset=utf-8"
) -> bytes:
    """One uncompressed WARC response record: WARC headers + HTTP/1.1
    response block + the mandated trailing CRLF CRLF."""
    http = (
        b"HTTP/1.1 200 OK" + CRLF
        + f"Content-Type: {content_type}".encode("ascii") + CRLF
        + f"Content-Length: {len(body)}".encode("ascii") + CRLF
        + CRLF
        + body
    )
    headers = [
        b"WARC/1.0",
        b"WARC-Type: response",
        b"WARC-Record-ID: " + _record_id(url, date_iso).encode("ascii"),
        f"WARC-Date: {date_iso}".encode("ascii"),
        f"WARC-Target-URI: {url}".encode("ascii"),
        b"Content-Type: application/http; msgtype=response",
        f"Content-Length: {len(http)}".encode("ascii"),
    ]
    return CRLF.join(headers) + CRLF + CRLF + http + CRLF + CRLF


def write_warc(records: Iterable[bytes], path: str, per_record_gzip: bool = True) -> None:
    """Concatenate records into one .warc(.gz) file. ``per_record_gzip``
    writes each record as its own gzip member (the Common Crawl layout:
    streamable, member-seekable)."""
    with open(path, "wb") as f:
        for rec in records:
            if per_record_gzip:
                f.write(gzip.compress(rec, mtime=0))
            else:
                f.write(rec)


def _decompress_if_gzip(data: bytes) -> bytes:
    if data[:2] == b"\x1f\x8b":
        # concatenated members: gzip.GzipFile reads them all. Corrupt
        # members surface as WarcFormatError like every other malformation
        # (the quarantine contract), not a raw gzip/EOF error.
        try:
            with gzip.GzipFile(fileobj=io.BytesIO(data)) as g:
                return g.read()
        except (gzip.BadGzipFile, EOFError, OSError) as e:
            raise WarcFormatError(f"corrupt gzip container: {e}")
    return data


def _parse_headers(block: bytes, what: str, offset: int) -> List[Tuple[str, str]]:
    out = []
    for line in block.split(CRLF):
        if not line:
            continue
        k, sep, v = line.partition(b":")
        if not sep:
            raise WarcFormatError(f"bad {what} header line at byte {offset}: {line!r}")
        try:
            key = k.decode("ascii").strip().lower()
        except UnicodeDecodeError:
            raise WarcFormatError(
                f"non-ASCII {what} header name at byte {offset}: {k!r}"
            )
        # WARC headers are UTF-8 per spec, but real Common Crawl HTTP
        # headers routinely carry raw latin-1 bytes (Content-Disposition
        # filenames, Server banners). utf-8 first (valid URIs stay exact),
        # latin-1 fallback (decodes any byte sequence) — header VALUES
        # never abort a record with a raw UnicodeDecodeError that callers
        # filtering on WarcFormatError (the declared quarantine contract)
        # would miss.
        try:
            val = v.decode("utf-8")
        except UnicodeDecodeError:
            val = v.decode("latin-1")
        out.append((key, val.strip()))
    return out


def parse_warc(data: bytes) -> Iterator[WarcRecord]:
    """Parse a WARC file's bytes (gzipped or plain) into records."""
    buf = _decompress_if_gzip(data)
    pos = 0
    n = len(buf)
    while pos < n:
        # skip inter-record blank lines
        while buf[pos : pos + 2] == CRLF:
            pos += 2
        if pos >= n:
            break
        head_end = buf.find(CRLF + CRLF, pos)
        if head_end < 0:
            raise WarcFormatError(f"unterminated record header at byte {pos}")
        header_block = buf[pos:head_end]
        if not header_block.startswith(b"WARC/"):
            raise WarcFormatError(f"missing WARC version line at byte {pos}")
        version_line, _, rest = header_block.partition(CRLF)
        if version_line not in (b"WARC/1.0", b"WARC/1.1"):
            raise WarcFormatError(f"unsupported version {version_line!r} at byte {pos}")
        headers = dict(_parse_headers(rest, "WARC", pos))
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            raise WarcFormatError(f"missing/invalid Content-Length at byte {pos}")
        if length < 0:
            # a negative length would move block_end BEHIND the header and
            # the loop would re-yield the same record forever (executor
            # task hangs + row accumulation until OOM)
            raise WarcFormatError(
                f"negative Content-Length {length} at byte {pos}"
            )
        block_start = head_end + 4
        block_end = block_start + length
        if block_end > n:
            raise WarcFormatError(f"truncated record block at byte {pos}")
        block = buf[block_start:block_end]
        status = ctype = None
        payload = block
        if headers.get("warc-type") == "response" and block.startswith(b"HTTP/"):
            he = block.find(CRLF + CRLF)
            if he < 0:
                raise WarcFormatError(f"unterminated HTTP headers at byte {pos}")
            status_line, _, hdrs = block[:he].partition(CRLF)
            parts = status_line.split(b" ", 2)
            if len(parts) < 2 or not parts[1].isdigit():
                raise WarcFormatError(f"bad HTTP status line at byte {pos}")
            status = int(parts[1])
            ctype = dict(_parse_headers(hdrs, "HTTP", pos)).get("content-type")
            payload = block[he + 4 :]
        yield WarcRecord(
            record_id=headers.get("warc-record-id", ""),
            warc_type=headers.get("warc-type", ""),
            warc_date=headers.get("warc-date", ""),
            target_uri=headers.get("warc-target-uri"),
            http_status=status,
            http_content_type=ctype,
            payload=payload,
        )
        pos = block_end
