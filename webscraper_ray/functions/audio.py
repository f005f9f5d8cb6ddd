"""From-scratch WAV (RIFF/WAVE) codec for the multimodal audio path.

Public-spec implementation (RIFF-1991 / Multimedia Programming
Interface and Data Specifications 1.0): RIFF chunk framing, ``fmt ``
(PCM format 1, 16-bit), ``data`` payload, unknown chunks skipped with
word alignment. Compressed formats (ADPCM, float, mu-law) raise
``NotImplementedError`` loudly.

Decode is pure numpy — the sample payload is reinterpreted zero-copy
with ``np.frombuffer`` — so the AudioStats actor-pool stage stays
vectorized per payload. The matching :func:`encode_wav` lets tests and
the SQL-gated oracle corpus synthesize REAL deterministic WAV bytes.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_wav", "encode_wav", "WAV_SIGNATURE"]

WAV_SIGNATURE = b"RIFF"


def decode_wav(data: bytes) -> "tuple[np.ndarray, int]":
    """WAV bytes -> (int16 samples shaped (n,) mono / (n, ch), sample_rate).

    Raises ``ValueError`` on malformed bytes and ``NotImplementedError``
    on valid-but-unsupported encodings (non-PCM or non-16-bit).
    """
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF/WAVE header")
    pos = 12
    fmt: "tuple[int, int, int, int] | None" = None  # (format, channels, rate, bits)
    samples: "np.ndarray | None" = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (clen,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + clen]
        if len(body) < clen:
            raise ValueError("wav: truncated chunk")
        if cid == b"fmt ":
            if clen < 16:
                raise ValueError("wav: short fmt chunk")
            wformat, channels, rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            if wformat != 1:
                raise NotImplementedError(f"wav: format {wformat} (only PCM)")
            if bits != 16:
                raise NotImplementedError(f"wav: {bits}-bit (only 16)")
            fmt = (wformat, channels, rate, bits)
        elif cid == b"data":
            if fmt is None:
                raise ValueError("wav: data chunk before fmt")
            arr = np.frombuffer(body[: clen - clen % 2], dtype="<i2")
            ch = fmt[1]
            samples = arr if ch == 1 else arr[: len(arr) - len(arr) % ch].reshape(-1, ch)
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or samples is None:
        raise ValueError("wav: missing fmt or data chunk")
    return samples, fmt[2]


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 samples (n,) mono or (n, ch) -> canonical 44-byte-header WAV."""
    arr = np.asarray(samples, dtype="<i2")
    channels = 1 if arr.ndim == 1 else arr.shape[1]
    payload = arr.tobytes()
    block_align = channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block_align, block_align, 16
    )
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def ulaw_decode(codes: "np.ndarray") -> "np.ndarray":
    """G.711 mu-law expansion, fully vectorized: uint8 codewords ->
    int16 linear samples (14-bit magnitude range, the wire format of
    8 kHz telephony audio and a common training-corpus input). Pure
    integer bit arithmetic straight from the ITU-T G.711 table
    construction: complement, split 1-3-4 into sign/exponent/mantissa,
    magnitude = ((2m + 33) << e) - 33."""
    u = (~codes.astype(np.uint8)) & 0xFF
    sign = (u & 0x80) != 0
    exp = (u >> 4) & 0x07
    mant = u & 0x0F
    mag = ((2 * mant.astype(np.int32) + 33) << exp) - 33
    return np.where(sign, -mag, mag).astype(np.int16)


def ulaw_encode(samples: "np.ndarray") -> "np.ndarray":
    """Inverse of :func:`ulaw_decode` (segment search + complement);
    round-trip-exact on every decoder output value."""
    s = samples.astype(np.int32)
    sign = s < 0
    mag = np.where(sign, -s, s)
    mag = np.minimum(mag + 33, 0x1FFF)
    exp = (np.floor(np.log2(mag)).astype(np.int32) - 5).clip(0, 7)
    mant = (mag >> (exp + 1)) & 0x0F
    u = (sign.astype(np.uint8) << 7) | (exp.astype(np.uint8) << 4) | mant.astype(np.uint8)
    return (~u) & 0xFF


__all__.extend(["ulaw_decode", "ulaw_encode"])
