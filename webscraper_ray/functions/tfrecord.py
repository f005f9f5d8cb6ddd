"""From-scratch TFRecord container codec — the de-facto sharded record
format of large training corpora (public spec: the TensorFlow
`tfrecord.cc` framing, documented at tensorflow.org/tutorials/load_data/tfrecord):

    each record = uint64le  length
                  uint32le  masked_crc32c(length bytes)
                  byte[length] payload
                  uint32le  masked_crc32c(payload)

with CRC-32C (Castagnoli, reflected poly 0x82F63B78) and the mask
``((crc >> 15 | crc << 17) + 0xa282ead8) mod 2^32`` — the mask exists so
a CRC stored next to CRC-protected data can't be mistaken for data.

Both CRCs are VERIFIED on read and any mismatch raises: a training-data
reader that silently skips a torn record ships corrupted shards
downstream. The decoder walks declared lengths only (like the WARC
reader in `warc.py`) — payloads are arbitrary bytes, typically the
protobuf messages `functions/protobuf.py` encodes.

Scale shape: encode/decode are pure per-shard byte kernels inside
``map_batches`` — one shard file per input block (the resumable-output
discipline), a bounded path list to distribute, no shuffle, no state.
The table-driven CRC is plain Python (fine at the per-record sizes
training shards use; a production build swaps in a C crc32c), the
framing walk is O(records), never O(bytes) rescans.

No reference analog (the webscraper speaks CBOR, ``src/app.ts``); this
is a beyond-reference container alongside WARC/Avro/ORC/WebDataset.
"""

from __future__ import annotations

import struct

__all__ = [
    "crc32c",
    "masked_crc32c",
    "write_tfrecords",
    "read_tfrecords",
]

_POLY = 0x82F63B78  # CRC-32C (Castagnoli), reflected
_MASK_DELTA = 0xA282EAD8
_U32 = 0xFFFFFFFF


def _make_table() -> list[int]:
    table = []
    for n in range(256):
        c = n
        for _ in range(8):
            c = (c >> 1) ^ _POLY if c & 1 else c >> 1
        table.append(c)
    return table


_TABLE = _make_table()


def crc32c(data: bytes, crc: int = 0) -> int:
    """CRC-32C over ``data``, continuing from ``crc`` (0 = fresh)."""
    c = (crc ^ _U32) & _U32
    tab = _TABLE
    for b in data:
        c = (c >> 8) ^ tab[(c ^ b) & 0xFF]
    return (c ^ _U32) & _U32


def masked_crc32c(data: bytes) -> int:
    """The TFRecord-masked CRC: rot-right-15 then add the mask delta."""
    c = crc32c(data)
    return (((c >> 15) | (c << 17)) + _MASK_DELTA) & _U32


def _unmask(masked: int) -> int:
    r = (masked - _MASK_DELTA) & _U32
    return ((r >> 17) | (r << 15)) & _U32


def write_tfrecords(records: list[bytes]) -> bytes:
    """Serialize ``records`` into one TFRecord shard's bytes."""
    out = bytearray()
    for payload in records:
        length = struct.pack("<Q", len(payload))
        out += length
        out += struct.pack("<I", masked_crc32c(length))
        out += payload
        out += struct.pack("<I", masked_crc32c(payload))
    return bytes(out)


def read_tfrecords(buf: bytes, verify: bool = True) -> list[bytes]:
    """Walk a TFRecord shard; returns payloads in order.

    Raises ``ValueError`` on truncation or (when ``verify``) on either
    CRC mismatching — torn shards must fail loudly, not thin the data.
    """
    out: list[bytes] = []
    pos = 0
    n = len(buf)
    while pos < n:
        if pos + 12 > n:
            raise ValueError(f"truncated TFRecord header at offset {pos}")
        length_bytes = buf[pos : pos + 8]
        (length,) = struct.unpack("<Q", length_bytes)
        (len_crc,) = struct.unpack("<I", buf[pos + 8 : pos + 12])
        if verify and masked_crc32c(length_bytes) != len_crc:
            raise ValueError(f"TFRecord length CRC mismatch at offset {pos}")
        pos += 12
        if pos + length + 4 > n:
            raise ValueError(f"truncated TFRecord payload at offset {pos}")
        payload = buf[pos : pos + length]
        (data_crc,) = struct.unpack("<I", buf[pos + length : pos + length + 4])
        if verify and masked_crc32c(payload) != data_crc:
            raise ValueError(f"TFRecord payload CRC mismatch at offset {pos}")
        out.append(payload)
        pos += length + 4
    return out
