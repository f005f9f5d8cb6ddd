"""From-scratch GIF codec (GIF87a/89a subset) for the multimodal stage.

Public-spec implementation (CompuServe GIF87a / GIF89a specification,
also documented in RFC-free public form at w3.org/Graphics/GIF): logical
screen descriptor, global/local color tables, GIF89a extension-block
skipping, and the variable-width LSB-first LZW of the image data stream
— including code-width growth, the KwKwK (code == next_code) case, and
CLEAR-code dictionary resets at the 4096-entry ceiling. Both the
sequential and the 4-pass interlaced row layouts decode (and encode, so
round-trips cover the reorder); multi-frame animations raise loudly
rather than decode wrong.

GIF's LZW differs from the PDF/TIFF LZWDecode already in
``oracle/pdf.py`` in three load-bearing ways, which is why this is a
separate codec rather than a parameterization: bits pack LSB-first (PDF
is MSB-first), the minimum code size is per-image (PDF fixes 8), and
there is no EarlyChange off-by-one — the encoder grows the code width
when ``next_code`` exceeds ``1 << width`` while the decoder, whose
table trails one entry behind, grows at ``next_code >= 1 << width``.

The matching :func:`encode_gif` is a REAL LZW compressor (prefix-table
greedy parse, not a literal-only escape hatch), so round-trip tests
exercise the decoder's dictionary-built entries, width growth and
4096-reset paths end-to-end, and the oracle corpus can synthesize
genuine GIF bytes whose pixel stats a SQL gate recomputes.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_gif", "encode_gif", "GIF_SIGNATURE"]

GIF_SIGNATURE = b"GIF8"

_MAX_CODE_WIDTH = 12
_TABLE_CEILING = 1 << _MAX_CODE_WIDTH  # 4096


def _lzw_compress(data: bytes, mcs: int) -> bytes:
    """GIF-variant LZW: LSB-first packing, CLEAR/EOI codes, width growth
    when ``next_code`` exceeds ``1 << width``, reset at 4096 entries."""
    clear = 1 << mcs
    eoi = clear + 1
    out = bytearray()
    bitbuf = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal bitbuf, nbits
        bitbuf |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            nbits -= 8

    width = mcs + 1
    table: dict[tuple[int, int], int] = {}
    next_code = eoi + 1
    emit(clear, width)
    if data:
        cur = data[0]
        for sym in data[1:]:
            key = (cur, sym)
            code = table.get(key)
            if code is not None:
                cur = code
                continue
            emit(cur, width)
            table[key] = next_code
            next_code += 1
            if next_code > (1 << width) and width < _MAX_CODE_WIDTH:
                width += 1
            if next_code == _TABLE_CEILING:
                emit(clear, width)
                table.clear()
                width = mcs + 1
                next_code = eoi + 1
            cur = sym
        emit(cur, width)
    emit(eoi, width)
    if nbits:
        out.append(bitbuf & 0xFF)
    return bytes(out)


def _lzw_decompress(data: bytes, mcs: int, n_expected: int) -> bytes:
    """Inverse of :func:`_lzw_compress`; raises on corrupt code streams."""
    clear = 1 << mcs
    eoi = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = mcs + 1
    next_code = eoi + 1
    out = bytearray()
    bitbuf = 0
    nbits = 0
    pos = 0
    prev: bytes | None = None
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                raise ValueError("gif: LZW stream ended before EOI")
            bitbuf |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = bitbuf & ((1 << width) - 1)
        bitbuf >>= width
        nbits -= width
        if code == eoi:
            break
        if code == clear:
            table = list(base)
            width = mcs + 1
            next_code = eoi + 1
            prev = None
            continue
        if prev is None:
            if code >= clear:
                raise ValueError("gif: first code after clear not a literal")
            entry = table[code]
        elif code < next_code:
            entry = table[code]
        elif code == next_code:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError("gif: code beyond table")
        out += entry
        if prev is not None and next_code < _TABLE_CEILING:
            table.append(prev + entry[:1])
            next_code += 1
            # decoder's table trails the encoder's by one entry, so it
            # grows the width one code earlier (>=, not >)
            if next_code >= (1 << width) and width < _MAX_CODE_WIDTH:
                width += 1
        prev = entry
        if len(out) > n_expected:
            raise ValueError("gif: more pixels than image descriptor")
    if len(out) != n_expected:
        raise ValueError("gif: pixel count mismatch")
    return bytes(out)


def _interlace_order(h: int) -> np.ndarray:
    """Row storage order of a GIF interlaced image: 4 passes starting at
    rows 0/4/2/1 with steps 8/8/4/2 (GIF87a spec, appendix E)."""
    return np.concatenate(
        [
            np.arange(0, h, 8),
            np.arange(4, h, 8),
            np.arange(2, h, 4),
            np.arange(1, h, 2),
        ]
    )


def encode_gif(
    indices: np.ndarray, palette: np.ndarray, *, interlaced: bool = False
) -> bytes:
    """Encode a (h, w) uint8 index array + (n, 3) uint8 palette as a
    single-frame GIF87a file with real LZW compression, optionally in
    the 4-pass interlaced row layout.
    The palette is padded to the next power of two (GIF requires it)."""
    if indices.ndim != 2:
        raise ValueError("encode_gif expects a 2-d index array")
    h, w = indices.shape
    ncolors = int(palette.shape[0])
    if not 2 <= ncolors <= 256:
        raise ValueError("palette must have 2..256 entries")
    size_bits = max(1, (ncolors - 1).bit_length())
    table_n = 1 << size_bits
    if int(indices.max(initial=0)) >= ncolors:
        raise ValueError("index out of palette range")
    mcs = max(2, size_bits)  # GIF mandates a minimum code size of >= 2
    out = bytearray(b"GIF87a")
    # logical screen descriptor: GCT present, color resolution 8 bits
    out += struct.pack("<HHBBB", w, h, 0x80 | (7 << 4) | (size_bits - 1), 0, 0)
    gct = np.zeros((table_n, 3), np.uint8)
    gct[:ncolors] = palette
    out += gct.tobytes()
    # image descriptor; bit 6 of the packed byte flags interlacing
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0x40 if interlaced else 0)
    out.append(mcs)
    rows = indices.astype(np.uint8)
    if interlaced:
        rows = rows[_interlace_order(h)]
    compressed = _lzw_compress(rows.tobytes(), mcs)
    for i in range(0, len(compressed), 255):
        chunk = compressed[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


def _skip_subblocks(payload: bytes, pos: int) -> int:
    while True:
        if pos >= len(payload):
            raise ValueError("gif: truncated sub-blocks")
        ln = payload[pos]
        pos += 1
        if ln == 0:
            return pos
        pos += ln


def decode_gif(payload: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Decode a single-frame GIF -> ((h, w) uint8 indices, (n, 3) palette).

    Handles GIF87a and GIF89a (extension blocks are skipped), global and
    local color tables, and the 4-pass interlaced row layout; raises
    loudly on missing color tables or corrupt LZW streams.
    """
    if len(payload) < 13 or payload[:4] != GIF_SIGNATURE or payload[4:6] not in (
        b"7a",
        b"9a",
    ):
        raise ValueError("not a GIF87a/GIF89a payload")
    _, _, packed, _, _ = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct: np.ndarray | None = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    while True:
        if pos >= len(payload):
            raise ValueError("gif: no image descriptor before trailer")
        block = payload[pos]
        pos += 1
        if block == 0x3B:
            raise ValueError("gif: no image data")
        if block == 0x21:  # GIF89a extension: label byte + sub-blocks
            pos = _skip_subblocks(payload, pos + 1)
            continue
        if block == 0x2C:
            break
        raise ValueError(f"gif: unknown block 0x{block:02x}")
    _, _, w, h, ipacked = struct.unpack_from("<HHHHB", payload, pos)
    pos += 9
    palette = gct
    if ipacked & 0x80:
        n = 2 << (ipacked & 0x07)
        palette = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    if palette is None:
        raise ValueError("gif: image has no color table")
    mcs = payload[pos]
    pos += 1
    if not 2 <= mcs <= 11:
        raise ValueError("gif: bad LZW minimum code size")
    stream = bytearray()
    while True:
        if pos >= len(payload):
            raise ValueError("gif: truncated image data")
        ln = payload[pos]
        pos += 1
        if ln == 0:
            break
        stream += payload[pos : pos + ln]
        pos += ln
    # enforce single-frame: only extensions may follow, then the trailer
    while True:
        if pos >= len(payload):
            raise ValueError("gif: truncated after image data (no trailer)")
        block = payload[pos]
        pos += 1
        if block == 0x3B:
            break
        if block == 0x21:
            pos = _skip_subblocks(payload, pos + 1)
            continue
        if block == 0x2C:
            raise ValueError("gif: multi-frame animations are not supported")
        raise ValueError(f"gif: unknown block 0x{block:02x} after image")
    raw = _lzw_decompress(bytes(stream), mcs, h * w)
    idx = np.frombuffer(raw, np.uint8).reshape(h, w)
    if ipacked & 0x40:
        deinterlaced = np.empty_like(idx)
        deinterlaced[_interlace_order(h)] = idx
        idx = deinterlaced
    if int(idx.max(initial=0)) >= palette.shape[0]:
        raise ValueError("gif: pixel index beyond color table")
    return idx, palette.copy()
