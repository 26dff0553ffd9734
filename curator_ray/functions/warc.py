"""Minimal WARC 1.0 reader/writer (ISO 28500, public spec) — stdlib only.

The sandbox has no ``warcio``; this module implements the subset of the
format the Common Crawl pipeline needs (reference
``stages/text/download/common_crawl/warc_iterator.py:30-54`` iterates
``response`` records via warcio):

- records = header block (CRLF-separated ``Name: value`` lines, terminated
  by an empty line) + ``Content-Length`` bytes of payload + CRLF CRLF;
- WARC files are usually *multi-member* gzip (one member per record) but
  plain concatenated records are also valid — both are handled (gzip is
  sniffed from the magic bytes);
- ``response`` record payloads are full HTTP responses: the HTTP status
  line + headers are stripped to yield the body, matching
  ``rec.content_stream().read()`` semantics.

The writer exists so tests and offline pipelines can build deterministic
fixture WARCs; it writes one gzip member per record (the Common Crawl
layout that makes byte-range record fetches possible).
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator
from typing import BinaryIO

_CRLF = b"\r\n"
_GZIP_MAGIC = b"\x1f\x8b"


def _read_record(stream: BinaryIO) -> tuple[dict[str, str], bytes] | None:
    """Read one WARC record from ``stream``; None at EOF."""
    # skip inter-record blank lines
    line = stream.readline()
    while line in (_CRLF, b"\n"):
        line = stream.readline()
    if not line:
        return None
    version = line.rstrip()
    if not version.startswith(b"WARC/"):
        raise ValueError(f"not a WARC record header: {version[:40]!r}")
    headers: dict[str, str] = {}
    while True:
        line = stream.readline()
        if not line or line in (_CRLF, b"\n"):
            break
        if line[:1] in (b" ", b"\t") and headers:  # folded continuation
            headers[last] += " " + line.strip().decode("utf-8", "replace")  # noqa: F821
            continue
        name, _, value = line.rstrip().decode("utf-8", "replace").partition(":")
        last = name.strip()
        headers[last] = value.strip()
    length = int(headers.get("Content-Length", "0"))
    payload = stream.read(length)
    if len(payload) != length:
        raise ValueError("truncated WARC record payload")
    return headers, payload


def strip_http_headers(payload: bytes) -> bytes:
    """Return the HTTP body of a response-record payload (the payload of a
    ``response`` record is the full HTTP response per the WARC spec)."""
    if payload[:5] in (b"HTTP/", b"http/"):
        sep = payload.find(b"\r\n\r\n")
        if sep < 0:
            sep = payload.find(b"\n\n")
            return payload[sep + 2 :] if sep >= 0 else payload
        return payload[sep + 4 :]
    return payload


def iter_warc_records(path: str) -> Iterator[tuple[dict[str, str], bytes]]:
    """Yield ``(warc_headers, raw_payload)`` for every record in the file.

    Handles multi-member gzip (the standard .warc.gz layout) and plain
    .warc files transparently.
    """
    with open(path, "rb") as f:
        magic = f.read(2)
        f.seek(0)
        stream: BinaryIO = gzip.GzipFile(fileobj=f) if magic == _GZIP_MAGIC else f  # type: ignore[assignment]
        while True:
            rec = _read_record(stream)
            if rec is None:
                break
            yield rec


def write_warc(path: str, records: list[dict], gzip_members: bool = True) -> None:
    """Write records as a WARC file (one gzip member per record by default).

    Each record dict: ``type`` (response/request/...), ``url``,
    ``record_id``, ``payload`` (bytes — for responses, the HTTP body;
    an HTTP/1.1 200 header block is prepended automatically).
    """
    with open(path, "wb") as out:
        for rec in records:
            payload = rec["payload"]
            if rec.get("type", "response") == "response":
                http = (
                    b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                    + b"Content-Length: " + str(len(payload)).encode() + _CRLF + _CRLF
                )
                payload = http + payload
            head = io.BytesIO()
            head.write(b"WARC/1.0" + _CRLF)
            wtype = rec.get("type", "response")
            head.write(f"WARC-Type: {wtype}".encode() + _CRLF)
            head.write(f"WARC-Record-ID: <urn:uuid:{rec['record_id']}>".encode() + _CRLF)
            if rec.get("url"):
                head.write(f"WARC-Target-URI: {rec['url']}".encode() + _CRLF)
            head.write(b"WARC-Date: 2020-01-01T00:00:00Z" + _CRLF)
            if wtype == "response":
                head.write(b"Content-Type: application/http; msgtype=response" + _CRLF)
            head.write(f"Content-Length: {len(payload)}".encode() + _CRLF)
            head.write(_CRLF)
            head.write(payload)
            head.write(_CRLF + _CRLF)
            raw = head.getvalue()
            out.write(gzip.compress(raw) if gzip_members else raw)
