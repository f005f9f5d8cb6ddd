"""From-scratch Protocol Buffers wire-format codec (proto3 encoding,
public spec: protobuf.dev/programming-guides/encoding) — the record
format training pipelines meet in TFRecord/Example shards and RPC dumps.

Implements the four wire types that cover the spec's scalar surface:

* 0 VARINT  — base-128 little-endian groups, msb-continuation
* 1 I64     — little-endian fixed 8 bytes
* 2 LEN     — varint length + payload (strings/bytes/submessages)
* 5 I32     — little-endian fixed 4 bytes

plus ZigZag for sint fields. The decoder takes a field schema and MUST
skip unknown fields by wire type (the spec's forward-compat contract) —
a decoder that only handles known tags breaks on any schema evolution.

Scale shape: encode/decode are pure per-row kernels inside
``map_batches`` (byte work dominates, like the PNG/JPEG codecs); no
shuffle, no state. The oracle gate recomputes every decoded field
arithmetically from the source table, so a single mis-shifted varint
group or wrong zigzag flips the value hash.

No reference analog (the webscraper speaks CBOR, ``src/app.ts``); this
is a beyond-reference source format alongside Avro/ORC/WARC.
"""

from __future__ import annotations

__all__ = [
    "encode_varint",
    "decode_varint",
    "zigzag_encode",
    "zigzag_decode",
    "encode_record",
    "decode_record",
]

_MASK64 = (1 << 64) - 1


def encode_varint(x: int) -> bytes:
    """Base-128 varint of an unsigned 64-bit int."""
    if not 0 <= x <= _MASK64:
        raise ValueError(f"varint out of uint64 range: {x}")
    out = bytearray()
    while True:
        b = x & 0x7F
        x >>= 7
        if x:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def decode_varint(buf: bytes, pos: int) -> tuple[int, int]:
    """(value, new_pos); raises on truncation or >10-byte runaways."""
    result = 0
    shift = 0
    start = pos
    while True:
        if pos >= len(buf):
            raise ValueError(f"truncated varint at byte {start}")
        if pos - start >= 10:
            raise ValueError(f"varint longer than 10 bytes at {start}")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result & _MASK64, pos
        shift += 7


def zigzag_encode(v: int) -> int:
    """Signed -> unsigned: 0,-1,1,-2 ... -> 0,1,2,3 (64-bit)."""
    return ((v << 1) ^ (v >> 63)) & _MASK64


def zigzag_decode(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def encode_record(fields: dict[int, tuple[str, object]]) -> bytes:
    """Encode ``{field_num: (kind, value)}`` where kind is one of
    ``uint`` (varint), ``sint`` (zigzag varint), ``str``/``bytes``
    (LEN), ``fixed32``, ``fixed64``. Fields emit in ascending number
    order (deterministic bytes)."""
    out = bytearray()
    for num in sorted(fields):
        kind, val = fields[num]
        if kind == "uint":
            out += encode_varint(num << 3 | 0)
            out += encode_varint(int(val))
        elif kind == "sint":
            out += encode_varint(num << 3 | 0)
            out += encode_varint(zigzag_encode(int(val)))
        elif kind in ("str", "bytes"):
            payload = val.encode("utf-8") if kind == "str" else bytes(val)
            out += encode_varint(num << 3 | 2)
            out += encode_varint(len(payload))
            out += payload
        elif kind == "fixed64":
            out += encode_varint(num << 3 | 1)
            out += int(val).to_bytes(8, "little")
        elif kind == "fixed32":
            out += encode_varint(num << 3 | 5)
            out += int(val).to_bytes(4, "little")
        else:
            raise ValueError(f"unknown field kind: {kind}")
    return bytes(out)


def decode_record(buf: bytes, schema: dict[int, str]) -> dict[int, object]:
    """Decode known fields per ``{field_num: kind}``; SKIP unknown
    fields by wire type (spec §"unknown fields"). Last-one-wins on
    repeated scalars (spec merge rule). Raises on truncation, wire
    type 3/4 (deprecated groups) and known-field wire-type mismatch."""
    out: dict[int, object] = {}
    pos = 0
    while pos < len(buf):
        tag, pos = decode_varint(buf, pos)
        num, wt = tag >> 3, tag & 0x7
        if num == 0:
            raise ValueError(f"field number 0 at byte {pos}")
        if wt == 0:
            val, pos = decode_varint(buf, pos)
        elif wt == 1:
            if pos + 8 > len(buf):
                raise ValueError(f"truncated I64 field {num}")
            val = int.from_bytes(buf[pos : pos + 8], "little")
            pos += 8
        elif wt == 2:
            ln, pos = decode_varint(buf, pos)
            if pos + ln > len(buf):
                raise ValueError(f"truncated LEN field {num}")
            val = buf[pos : pos + ln]
            pos += ln
        elif wt == 5:
            if pos + 4 > len(buf):
                raise ValueError(f"truncated I32 field {num}")
            val = int.from_bytes(buf[pos : pos + 4], "little")
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wt} (field {num})")
        kind = schema.get(num)
        if kind is None:
            continue  # unknown field: skipped, not an error
        expect_wt = {"uint": 0, "sint": 0, "fixed64": 1, "str": 2, "bytes": 2, "fixed32": 5}[kind]
        if wt != expect_wt:
            raise ValueError(
                f"field {num}: wire type {wt}, schema kind {kind!r} wants {expect_wt}"
            )
        if kind == "sint":
            val = zigzag_decode(val)
        elif kind == "str":
            val = val.decode("utf-8")
        out[num] = val
    return out
