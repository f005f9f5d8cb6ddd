"""From-scratch PNG codec (baseline subset) for the multimodal stage.

Public-spec implementation (PNG: RFC 2083 / W3C PNG second edition):
chunk framing with CRC-32 verification, zlib-inflated IDAT, and all five
scanline filters (None/Sub/Up/Average/Paeth) un-applied per row. The
supported subset is 8-bit greyscale (colour type 0) and 8-bit RGB
(colour type 2), non-interlaced — the "RGB8/grayscale subset" a
training-data pipeline actually ingests after upstream normalization.
JPEG/video stay behind the honest ``NotImplementedError`` stubs in
:mod:`.multimodal`.

Decode shape: numpy per scanline — Up and Sub rows un-filter fully
vectorized (Sub is a per-lane cumulative sum mod 256); Average/Paeth
rows carry an inherent left-pixel dependency, so those loop per PIXEL
(vector over channels). The per-image work is bounded by the image,
and the stage runs inside an actor pool over small batches.

The matching :func:`encode_png` exists so tests and the oracle corpus
can synthesize REAL deterministic PNG bytes (the encoder can force any
per-row filter type, which is how the decoder's five filter paths get
exercised end-to-end).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = ["decode_png", "encode_png", "PNG_SIGNATURE"]

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

_COLOR_CHANNELS = {0: 1, 2: 3}  # greyscale, truecolour
_CHANNELS_COLOR = {1: 0, 3: 2}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa_ = abs(p - a)
    pb = abs(p - b)
    pc = abs(p - c)
    if pa_ <= pb and pa_ <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array (h, w) for greyscale, (h, w, 3) for RGB.

    Raises ``ValueError`` on malformed bytes and ``NotImplementedError``
    on valid-but-unsupported PNGs (palette/alpha/16-bit/interlaced).
    """
    if data[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    ihdr: bytes | None = None
    idat: list[bytes] = []
    saw_end = False
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length or pos + 12 + length > len(data):
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if crc != (zlib.crc32(ctype + body) & 0xFFFFFFFF):
            raise ValueError(f"PNG chunk CRC mismatch in {ctype!r}")
        pos += 12 + length
        if ctype == b"IHDR":
            ihdr = body
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            saw_end = True
            break
        # ancillary chunks (tEXt, pHYs, ...) are skipped per spec
    if ihdr is None or not idat or not saw_end:
        raise ValueError("PNG missing IHDR/IDAT/IEND")
    w, h, bitdepth, color, comp, filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    if comp != 0 or filt != 0:
        raise ValueError("PNG: unknown compression/filter method")
    if interlace != 0:
        raise NotImplementedError("interlaced PNG not supported")
    if bitdepth != 8 or color not in _COLOR_CHANNELS:
        raise NotImplementedError(
            f"PNG bitdepth={bitdepth} colour={color} outside the 8-bit "
            "grey/RGB subset"
        )
    if w == 0 or h == 0:
        raise ValueError("PNG: zero dimension")
    ch = _COLOR_CHANNELS[color]
    stride = w * ch
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != (stride + 1) * h:
        raise ValueError("PNG: decompressed size mismatch")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for r in range(h):
        base = r * (stride + 1)
        ftype = raw[base]
        line = np.frombuffer(raw, np.uint8, stride, base + 1)
        if ftype == 0:  # None
            cur = line.copy()
        elif ftype == 1:  # Sub: per-lane prefix sum mod 256 (vectorized)
            lanes = line.reshape(w, ch).astype(np.int64)
            cur = (np.cumsum(lanes, axis=0) % 256).astype(np.uint8).reshape(stride)
        elif ftype == 2:  # Up (vectorized; uint8 addition wraps mod 256)
            cur = line + prev
        elif ftype == 3:  # Average: left-dependency -> per-pixel loop
            lp = line.reshape(w, ch).astype(np.int64)
            up = prev.reshape(w, ch).astype(np.int64)
            px = np.zeros((w, ch), dtype=np.int64)
            left = np.zeros(ch, dtype=np.int64)
            for x in range(w):
                left = (lp[x] + (left + up[x]) // 2) % 256
                px[x] = left
            cur = px.astype(np.uint8).reshape(stride)
        elif ftype == 4:  # Paeth: nonlinear predictor -> per-pixel loop
            lp = line.reshape(w, ch)
            up = prev.reshape(w, ch)
            px = np.zeros((w, ch), dtype=np.uint8)
            for x in range(w):
                for c in range(ch):
                    a = int(px[x - 1, c]) if x else 0
                    b = int(up[x, c])
                    cc = int(up[x - 1, c]) if x else 0
                    px[x, c] = (int(lp[x, c]) + _paeth(a, b, cc)) % 256
            cur = px.reshape(stride)
        else:
            raise ValueError(f"PNG: unknown filter type {ftype}")
        out[r] = cur
        prev = cur
    return out.reshape(h, w) if ch == 1 else out.reshape(h, w, ch)


def _filter_row(
    ftype: int, line: np.ndarray, prev: np.ndarray, ch: int
) -> np.ndarray:
    """Apply filter ``ftype`` to a reconstructed row (encoder side)."""
    w = line.size // ch
    li = line.astype(np.int64)
    pi = prev.astype(np.int64)
    if ftype == 0:
        return line.copy()
    if ftype == 1:  # Sub
        left = np.zeros_like(li)
        left[ch:] = li[:-ch]
        return ((li - left) % 256).astype(np.uint8)
    if ftype == 2:  # Up
        return ((li - pi) % 256).astype(np.uint8)
    if ftype == 3:  # Average
        left = np.zeros_like(li)
        left[ch:] = li[:-ch]
        return ((li - (left + pi) // 2) % 256).astype(np.uint8)
    if ftype == 4:  # Paeth
        out = np.empty_like(line)
        lp = li.reshape(w, ch)
        up = pi.reshape(w, ch)
        for x in range(w):
            for c in range(ch):
                a = int(lp[x - 1, c]) if x else 0
                b = int(up[x, c])
                cc = int(up[x - 1, c]) if x else 0
                out[x * ch + c] = (int(lp[x, c]) - _paeth(a, b, cc)) % 256
        return out
    raise ValueError(f"unknown filter type {ftype}")


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray, row_filters: "list[int] | None" = None) -> bytes:
    """uint8 (h, w) or (h, w, 3) array -> PNG bytes.

    ``row_filters`` forces the per-row filter type (default: row index
    mod 5, so every filter path round-trips in tests); a production
    encoder would pick filters heuristically, which matters for size,
    not correctness.
    """
    a = np.asarray(img, dtype=np.uint8)
    if a.ndim == 2:
        h, w = a.shape
        ch = 1
    elif a.ndim == 3 and a.shape[2] in _CHANNELS_COLOR:
        h, w, ch = a.shape
    else:
        raise ValueError(f"unsupported image shape {a.shape}")
    color = _CHANNELS_COLOR[ch]
    flat = a.reshape(h, w * ch)
    filters = row_filters if row_filters is not None else [r % 5 for r in range(h)]
    if len(filters) != h:
        raise ValueError("row_filters length must equal image height")
    prev = np.zeros(w * ch, dtype=np.uint8)
    scan = bytearray()
    for r in range(h):
        scan.append(filters[r])
        scan.extend(_filter_row(filters[r], flat[r], prev, ch).tobytes())
        prev = flat[r]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(scan), 6))
        + _chunk(b"IEND", b"")
    )
