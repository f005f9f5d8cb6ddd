"""E18 response codec: CBOR/JSON body encoding + conditional gzip.

Mirrors the reference's response encoder (``src/app.ts:120-154``):
objects encode to CBOR when the client accepts it, else UTF-8 JSON;
encoded bodies longer than ``GZIP_MIN_LENGTH`` (128, ``src/app.ts:23``)
are gzip-compressed when the client accepts gzip; strings gzip under the
same rule without re-encoding. In the batch engine this is the output
codec for serialized document payloads (e.g. an export sink).
"""

from __future__ import annotations

import gzip
import json

from .cbor import dumps as cbor_dumps

__all__ = ["GZIP_MIN_LENGTH", "encode_response", "decode_response"]

GZIP_MIN_LENGTH = 128  # src/app.ts:23


def encode_response(
    body: object,
    accept_cbor: bool = True,
    accept_gzip: bool = True,
) -> tuple[bytes, str, str | None]:
    """Returns ``(payload, content_type, content_encoding)``.

    ``content_encoding`` is ``'gzip'`` or ``None`` — exactly the
    reference's conditions (object -> CBOR/JSON then maybe gzip; string
    -> maybe gzip; gzip only when encoded length > 128 and accepted).
    """
    if isinstance(body, str):
        data = body.encode("utf-8")
        ctype = "text/plain; charset=utf-8"
        # the reference tests body.length on the JS STRING (UTF-16 code
        # units, src/app.ts) — not the encoded byte count. Compare in
        # code units (surrogate pairs count 2) so non-ASCII strings near
        # the 128 boundary pick the same branch as the reference.
        code_units = len(body) + sum(1 for ch in body if ord(ch) > 0xFFFF)
        if accept_gzip and code_units > GZIP_MIN_LENGTH:
            return gzip.compress(data, mtime=0), ctype, "gzip"
        return data, ctype, None
    if accept_cbor:
        data = cbor_dumps(body)
        ctype = "application/cbor"
    else:
        # the reference buffers the serialized JSON first
        # (Buffer.from(JSON.stringify(body), 'utf8'), src/app.ts:128) and
        # tests body.length on the BUFFER — i.e. UTF-8 bytes, unlike the
        # plain-string branch above. Fall through to the byte check.
        data = json.dumps(body, ensure_ascii=False, separators=(",", ":")).encode("utf-8")
        ctype = "application/json"
    if accept_gzip and len(data) > GZIP_MIN_LENGTH:
        # mtime=0: deterministic output (gzip headers embed a timestamp)
        return gzip.compress(data, mtime=0), ctype, "gzip"
    return data, ctype, None


def decode_response(payload: bytes, content_encoding: str | None = None) -> bytes:
    """Inverse transport step (client side): un-gzip when flagged."""
    if content_encoding == "gzip":
        return gzip.decompress(payload)
    if content_encoding in (None, "", "identity"):
        return payload
    raise ValueError(f"unsupported content-encoding: {content_encoding}")


_META_CHARSET = None  # compiled lazily (import cost discipline)

_CHARSET_ALIASES = {
    "windows-1252": "cp1252",
    "utf-8": "utf-8",
    "iso-8859-1": "latin-1",
}


def sniff_decode(payload: bytes) -> tuple[str, str]:
    """(charset_label, decoded_text) for a raw fetched body — the
    decode step every crawler runs before extraction (WHATWG encoding
    sniffing, the BOM-first subset): a UTF-8/UTF-16 byte-order mark
    wins outright; otherwise the first 1024 bytes are scanned for an
    HTML ``<meta charset="...">`` declaration; otherwise UTF-8 is
    assumed. Labels name the DECISION (bom vs meta vs default), not
    just the codec, so downstream stats can audit how pages declared
    themselves. Raises on an undecodable body or an unknown declared
    charset — loud, never mojibake."""
    global _META_CHARSET
    if payload.startswith(b"\xef\xbb\xbf"):
        return "utf-8-bom", payload[3:].decode("utf-8")
    if payload.startswith(b"\xff\xfe"):
        return "utf-16le", payload[2:].decode("utf-16-le")
    if payload.startswith(b"\xfe\xff"):
        return "utf-16be", payload[2:].decode("utf-16-be")
    if _META_CHARSET is None:
        import re

        _META_CHARSET = re.compile(rb'<meta\s+charset="([^"]{1,40})"')
    m = _META_CHARSET.search(payload[:1024])
    if m:
        declared = m.group(1).decode("ascii").lower()
        codec = _CHARSET_ALIASES.get(declared)
        if codec is None:
            raise ValueError(f"unknown declared charset: {declared}")
        return f"{declared}-meta", payload.decode(codec)
    return "utf-8-default", payload.decode("utf-8")
