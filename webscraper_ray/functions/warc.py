"""WARC (Web ARChive, ISO 28500 / WARC 1.1) writer + streaming reader.

The native container of web-scale text corpora (Common Crawl publishes
WARC): length-prefixed records — a CRLF header block (``WARC/1.1``
version line + ``Name: value`` fields), ``Content-Length`` counting the
payload bytes, then the payload and a blank-line separator. Because the
payload length is DECLARED, payloads may contain anything (including
``\\r\\n\\r\\n``); a parser that splits on blank lines instead of
honoring Content-Length corrupts at the first binary body — the reader
here walks records by declared length and raises loudly on truncation,
bad version lines, or a missing Content-Length.

Shape notes for the Ray pipeline (`queries.q_warc_roundtrip`):
- the WRITER is a ``map_batches`` sink: each block serializes its rows
  to ONE ``part-<min_id>.warc`` file (the resumable-output discipline —
  a re-run skips finished parts by name) and emits a one-row manifest;
- the READER is ``read_binary_files`` over the directory followed by a
  per-file record walk in ``map_batches`` — the per-RECORD Python loop
  is container parsing (like the GIF/AVI codecs), never a per-row loop
  over a decoded table.

Public spec only (ISO 28500:2017 record grammar, also published as the
IIPC WARC 1.1 standard); no reference analog — the reference stores
pages in a DB table (src/db/model.ts), WARC is the task-brief "source
format breadth" axis.
"""

from __future__ import annotations

__all__ = [
    "write_warc_record",
    "parse_warc",
    "gzip_member",
    "parse_warc_gz",
    "WARC_VERSION",
]

WARC_VERSION = b"WARC/1.1"
_CRLF = b"\r\n"


def write_warc_record(
    target_uri: str,
    payload: bytes,
    *,
    record_id: str,
    date: str = "2026-01-01T00:00:00Z",
    warc_type: str = "response",
    content_type: str = "application/http;msgtype=response",
) -> bytes:
    """One serialized WARC record (header block + payload + separator)."""
    head = _CRLF.join(
        [
            WARC_VERSION,
            b"WARC-Type: " + warc_type.encode(),
            b"WARC-Record-ID: <" + record_id.encode() + b">",
            b"WARC-Date: " + date.encode(),
            b"WARC-Target-URI: " + target_uri.encode(),
            b"Content-Type: " + content_type.encode(),
            b"Content-Length: " + str(len(payload)).encode(),
        ]
    )
    return head + _CRLF + _CRLF + payload + _CRLF + _CRLF


def gzip_member(record: bytes) -> bytes:
    """One deterministic gzip member per WARC record — the Common Crawl
    convention (each record its own member, so a reader can split work
    at member boundaries without decompressing the whole file). mtime
    pinned to 0 for byte-reproducible output."""
    import gzip

    return gzip.compress(record, compresslevel=6, mtime=0)


def parse_warc_gz(blob: bytes) -> list[dict]:
    """Parse a multi-member gzip WARC file (``.warc.gz``): inflate each
    member in sequence with raw zlib (wbits=47 auto-detects the gzip
    wrapper; ``unused_data`` marks the member boundary), then walk the
    records of each member with :func:`parse_warc`. Raises loudly on a
    truncated member or trailing garbage."""
    import zlib

    out: list[dict] = []
    rest = blob
    while rest:
        d = zlib.decompressobj(wbits=47)
        try:
            chunk = d.decompress(rest)
        except zlib.error as e:
            raise ValueError(f"warc.gz: corrupt gzip member: {e}") from None
        if not d.eof:
            raise ValueError("warc.gz: truncated gzip member")
        out.extend(parse_warc(chunk))
        rest = d.unused_data
    return out


def parse_warc(blob: bytes) -> list[dict]:
    """Walk every record of a WARC file by DECLARED Content-Length.

    Returns dicts with ``warc_type``, ``record_id``, ``date``,
    ``target_uri`` (None when absent, e.g. warcinfo records) and
    ``payload``. Raises ValueError on a bad version line, a missing
    Content-Length, truncation, or a corrupt record separator.
    """
    out: list[dict] = []
    pos = 0
    n = len(blob)
    while pos < n:
        head_end = blob.find(_CRLF + _CRLF, pos)
        if head_end < 0:
            raise ValueError("warc: truncated header block")
        head = blob[pos:head_end]
        lines = head.split(_CRLF)
        if not lines[0].startswith(b"WARC/"):
            raise ValueError(f"warc: bad version line {lines[0][:20]!r}")
        fields: dict[bytes, bytes] = {}
        for line in lines[1:]:
            k, sep, v = line.partition(b":")
            if not sep:
                raise ValueError(f"warc: malformed header line {line[:40]!r}")
            fields[k.strip().lower()] = v.strip()
        if b"content-length" not in fields:
            raise ValueError("warc: record missing Content-Length")
        length = int(fields[b"content-length"])
        body_at = head_end + 4
        if body_at + length + 4 > n:
            raise ValueError("warc: payload truncated")
        payload = blob[body_at : body_at + length]
        if blob[body_at + length : body_at + length + 4] != _CRLF + _CRLF:
            raise ValueError("warc: missing record separator after payload")
        rid = fields.get(b"warc-record-id", b"").strip(b"<>").decode()
        uri = fields.get(b"warc-target-uri")
        out.append(
            {
                "warc_type": fields.get(b"warc-type", b"").decode(),
                "record_id": rid,
                "date": fields.get(b"warc-date", b"").decode(),
                "target_uri": uri.decode() if uri is not None else None,
                "payload": payload,
            }
        )
        pos = body_at + length + 4
    return out
