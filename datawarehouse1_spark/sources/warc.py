"""WARC (ISO 28500 Web ARChive) reader in pure stdlib — the container
format of web-crawl training corpora (Common Crawl ships WARC files of
gzip members, one per record).

Implements the subset a text-pipeline actually consumes:

  * record framing — "WARC/1.0" version line, named headers, a body of
    exactly Content-Length bytes, a blank-line record separator;
  * gzip handling — plain (uncompressed), whole-file gzip, and the
    Common Crawl layout of one gzip MEMBER per record (iterated via
    zlib's unused_data, no temp files);
  * HTTP response payloads — the stored bytes are a full HTTP/1.1
    response; the entity body starts after the header terminator;
  * a minimal, exactly-invertible HTML text extractor (strip
    script/style, drop tags, unescape entities) so synthesized pages
    round-trip text bit-for-bit — which is what lets the declared query
    hash-match a plain DuckDB projection of the source documents.

The reference ETL never reads archives (etl/app.py is xlsx-only); this
belongs to the LLM-pipeline extension surface. encode_warc is the
fixture writer. Pure bytes — safe inside Arrow-batched executors.
"""

from __future__ import annotations

import gzip
import html as _html
import re
import zlib
from dataclasses import dataclass


@dataclass
class WarcRecord:
    warc_type: str
    target_uri: str | None
    date: str | None
    content_type: str | None
    body: bytes


_CRLF = b"\r\n"


def _split_gzip_members(payload: bytes) -> list[bytes]:
    """Decompress a concatenation of gzip members into one chunk per
    member (the Common Crawl record layout)."""
    out = []
    rest = payload
    while rest:
        d = zlib.decompressobj(wbits=31)
        try:
            out.append(d.decompress(rest))
        except zlib.error as exc:
            raise ValueError(f"corrupt gzip member in WARC payload: {exc}") from exc
        if not d.eof:
            raise ValueError("truncated gzip member in WARC payload")
        rest = d.unused_data
    return out


def parse_warc(payload: bytes) -> list[WarcRecord]:
    """Bytes (plain / whole-gzip / member-gzip) -> list of records."""
    if payload[:2] == b"\x1f\x8b":
        chunks = _split_gzip_members(payload)
        if len(chunks) == 1:
            data = chunks[0]  # whole-file gzip: records are concatenated
        else:
            return [r for c in chunks for r in _parse_plain(c)]
    else:
        data = payload
    return _parse_plain(data)


def _parse_plain(data: bytes) -> list[WarcRecord]:
    records = []
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record blank lines
        while pos < n and data[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        eol = data.index(_CRLF, pos)
        version = data[pos:eol]
        if not version.startswith(b"WARC/"):
            raise ValueError(f"expected WARC version line at offset {pos}")
        pos = eol + 2
        headers: dict[str, str] = {}
        while True:
            eol = data.index(_CRLF, pos)
            line = data[pos:eol]
            pos = eol + 2
            if not line:
                break
            key, _, value = line.partition(b":")
            headers[key.decode("latin-1").strip().lower()] = (
                value.decode("latin-1").strip()
            )
        length = int(headers.get("content-length", "0"))
        body = data[pos : pos + length]
        if len(body) != length:
            raise ValueError("WARC record body truncated")
        pos += length
        records.append(
            WarcRecord(
                warc_type=headers.get("warc-type", ""),
                target_uri=headers.get("warc-target-uri"),
                date=headers.get("warc-date"),
                content_type=headers.get("content-type"),
                body=body,
            )
        )
    return records


def http_response_body(record_body: bytes) -> bytes:
    """The stored payload of a response record is a full HTTP response;
    the entity body starts after the first blank line."""
    sep = record_body.find(b"\r\n\r\n")
    if sep < 0:
        raise ValueError("HTTP payload has no header terminator")
    return record_body[sep + 4 :]


_TAG_RE = re.compile(r"<[^>]*>")
_DROP_RE = re.compile(
    r"<(script|style)\b[^>]*>.*?</\1>", re.IGNORECASE | re.DOTALL
)


def extract_text(html_bytes: bytes) -> str:
    """Minimal boilerplate-stripping text extractor: drop script/style
    subtrees, strip all tags, unescape entities. Exactly inverts
    wrap_html's escaping, so synthesized pages round-trip text
    bit-for-bit (the declared query's oracle relies on this)."""
    s = html_bytes.decode("utf-8", errors="replace")
    s = _DROP_RE.sub("", s)
    s = _TAG_RE.sub("", s)
    return _html.unescape(s)


def wrap_html(text: str, title: str = "") -> bytes:
    """Fixture page builder: the body contains exactly the escaped text
    (no added whitespace), plus a script block the extractor must drop."""
    return (
        "<html><head><script>var x=1&&2;</script></head><body>"
        + _html.escape(text, quote=False)
        + "</body></html>"
    ).encode("utf-8")


def encode_warc(
    pages: list[tuple[str, str, bytes]],
    per_record_gzip: bool = True,
) -> bytes:
    """[(uri, date, html_bytes)] -> WARC bytes of response records
    (one gzip member per record when per_record_gzip, the Common Crawl
    layout; plain concatenation otherwise)."""
    out = bytearray()
    for uri, date, page in pages:
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
            + b"Content-Length: " + str(len(page)).encode() + b"\r\n\r\n"
            + page
        )
        headers = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            + b"WARC-Target-URI: " + uri.encode("utf-8") + _CRLF
            + b"WARC-Date: " + date.encode("ascii") + _CRLF
            + b"Content-Type: application/http; msgtype=response\r\n"
            + b"Content-Length: " + str(len(http)).encode() + _CRLF
            + _CRLF
        )
        record = headers + http + _CRLF + _CRLF
        out += gzip.compress(record, 6) if per_record_gzip else record
    return bytes(out)
