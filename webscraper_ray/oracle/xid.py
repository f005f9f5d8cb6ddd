"""Deterministic 12-byte sortable document ids (Xid replacement).

The reference keys the ``doc`` table by an Xid (``src/db/model.ts:5,29-43``):
12 bytes whose leading 4 bytes are a big-endian unix timestamp, so
byte-descending order is newest-first — ``findLatest`` exploits that for
latest-per-url argmax (``src/db/model.ts:169-183``, SURVEY.md A3).

Reference Xids embed wall clock + machine randomness, which breaks
reproducibility; we keep the layout (4-byte BE timestamp prefix, so the
same sort trick works) but derive the trailing 8 bytes from
``(wave, canon_url)`` via blake2b — stable across runs and parallelism.

The canonical string form is base32-hex (20 chars, ``0-9a-v``) like xid's.
"""

from __future__ import annotations

import hashlib

__all__ = ["make_xid", "xid_timestamp", "xid_to_str", "xid_from_str"]

_B32_ALPHABET = "0123456789abcdefghijklmnopqrstuv"
_B32_INDEX = {c: i for i, c in enumerate(_B32_ALPHABET)}


def make_xid(timestamp: int, wave: int, canon_url: str) -> bytes:
    """12-byte id: BE uint32 timestamp + 8 deterministic bytes."""
    tail = hashlib.blake2b(
        f"{wave}\x00{canon_url}".encode(), digest_size=8
    ).digest()
    return int(timestamp).to_bytes(4, "big") + tail


def xid_timestamp(xid: bytes) -> int:
    """Unix seconds embedded in the id (``Xid.timestamp()``)."""
    return int.from_bytes(xid[:4], "big")


def xid_to_str(xid: bytes) -> str:
    """base32-hex encoding, 20 chars (xid canonical string form)."""
    n = int.from_bytes(xid, "big") << 4  # pad 96 bits to 100 (20 x 5-bit chars)
    chars = []
    for shift in range(95, -1, -5):
        chars.append(_B32_ALPHABET[(n >> shift) & 31])
    return "".join(chars)


def xid_from_str(s: str) -> bytes:
    if len(s) != 20:
        raise ValueError(f"xid string must be 20 chars, got {len(s)}")
    n = 0
    for c in s:
        n = (n << 5) | _B32_INDEX[c]
    return (n >> 4).to_bytes(12, "big")
