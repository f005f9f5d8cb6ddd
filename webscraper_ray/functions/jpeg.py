"""From-scratch baseline JPEG codec (ITU-T T.81 subset) for the
multimodal stage.

Public-spec implementation (ITU-T T.81 / ISO 10918-1, JFIF colour
conventions): baseline sequential DCT, 8-bit precision, Huffman
entropy coding with byte stuffing and restart markers, 1- or
3-component images with sampling factors 1 or 2 (4:4:4, 4:2:2, 4:2:0),
canonical-Huffman DHT tables, DQT, DRI, SOF0/SOF1, SOS. Progressive
(SOF2), arithmetic coding, 12-bit precision and 4-component CMYK stay
out of scope — they raise ``NotImplementedError`` loudly.

Decode shape: the per-symbol Huffman walk is a Python loop (inherent
bit-serial data dependency), but everything after entropy decode is
vectorized numpy over ALL blocks of a component at once — dequantize,
dezigzag, and the 2-D IDCT as two (8,8) matrix products broadcast over
an (n_blocks, 8, 8) stack. The stage runs inside an actor pool over
small batches, so per-image Python cost is bounded and parallel.

The matching :func:`encode_jpeg` exists so tests and the oracle corpus
can synthesize REAL deterministic JPEG bytes without any codec
library. The encoder builds its own canonical Huffman tables from the
data (any valid DHT is legal in the stream), which also exercises the
decoder's generic table handling rather than only the Annex-K tables.

Exactness contract used by the SQL-gated corpus
(:func:`~webscraper_ray.functions.multimodal.synth_jpeg_payload`):
an image made of CONSTANT 8x8 blocks has only DC energy, and with a DC
quantization step of 8 the quantized DC is exactly ``v - 128`` — so
decode reproduces every pixel EXACTLY (the float IDCT error is ~1e-10,
killed by the final round), letting a DuckDB oracle recompute pixel
stats arithmetically. General images round-trip within +/-1 per pixel
at quantization 1 (pinned by unit tests).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_jpeg", "encode_jpeg", "JPEG_SIGNATURE"]

JPEG_SIGNATURE = b"\xff\xd8"

# zigzag index: ZIGZAG[k] = (row, col) of the k-th coefficient
_ZZ_ORDER: list[tuple[int, int]] = []


def _build_zigzag() -> None:
    # standard zigzag alternates direction per anti-diagonal: even
    # diagonals run bottom-left -> top-right (row decreasing)
    order = sorted(
        ((r, c) for r in range(8) for c in range(8)),
        key=lambda rc: (rc[0] + rc[1], -rc[0] if (rc[0] + rc[1]) % 2 == 0 else rc[0]),
    )
    _ZZ_ORDER.extend(order)


_build_zigzag()
_ZZ_ROWS = np.array([r for r, _ in _ZZ_ORDER], dtype=np.int64)
_ZZ_COLS = np.array([c for _, c in _ZZ_ORDER], dtype=np.int64)
# flat position (0..63) of zigzag index k
_ZZ_FLAT = _ZZ_ROWS * 8 + _ZZ_COLS

# orthonormal DCT-II matrix: M[k, n] = c(k) cos((2n+1) k pi / 16)
_M = np.zeros((8, 8))
for _k in range(8):
    _c = np.sqrt(0.125) if _k == 0 else 0.5
    for _n in range(8):
        _M[_k, _n] = _c * np.cos((2 * _n + 1) * _k * np.pi / 16)
_MT = _M.T.copy()


def _idct_blocks(coefs: np.ndarray) -> np.ndarray:
    """(n, 8, 8) dequantized coefficients -> (n, 8, 8) spatial (pre-shift)."""
    return _MT @ coefs @ _M


def _fdct_blocks(blocks: np.ndarray) -> np.ndarray:
    """(n, 8, 8) level-shifted samples -> (n, 8, 8) DCT coefficients."""
    return _M @ blocks @ _MT


# ---------------------------------------------------------------------------
# Huffman tables
# ---------------------------------------------------------------------------


class _HuffDecoder:
    """Canonical Huffman decoder built from a DHT (counts, symbols)."""

    __slots__ = ("lookup", "max_len")

    def __init__(self, counts: list[int], symbols: bytes):
        # canonical code assignment per T.81 Annex C
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                self.lookup[(length, code)] = symbols[k]
                code += 1
                k += 1
            code <<= 1
        self.max_len = max((l for l, _ in self.lookup), default=0)


def _canonical_codes(counts: list[int], symbols: bytes) -> dict[int, tuple[int, int]]:
    """symbol -> (length, code) for an encoder-side table."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            out[symbols[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return out


def _fixed_length_table(syms: "set[int]") -> tuple[list[int], bytes]:
    """Build a valid DHT (counts, symbols) giving every symbol the same
    code length L with the all-ones code of length L left unused (T.81
    requires the all-1-bits code be reserved for length extension)."""
    ordered = sorted(syms) if syms else [0]
    n = len(ordered)
    length = max(1, (n + 1 - 1).bit_length())  # 2^L >= n+1
    while (1 << length) < n + 1:
        length += 1
    counts = [0] * 16
    counts[length - 1] = n
    return counts, bytes(ordered)


# ---------------------------------------------------------------------------
# Bit I/O
# ---------------------------------------------------------------------------


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 byte
    stuffing; stops at any non-stuffed marker (caller handles RSTn)."""

    __slots__ = ("data", "pos", "bitbuf", "nbits", "marker")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> bool:
        if self.pos >= len(self.data):
            return False
        b = self.data[self.pos]
        if b == 0xFF:
            if self.pos + 1 < len(self.data) and self.data[self.pos + 1] == 0x00:
                self.pos += 2
            else:
                self.marker = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else None
                return False
        else:
            self.pos += 1
        self.bitbuf = (self.bitbuf << 8) | b
        self.nbits += 8
        return True

    def read_bit(self) -> int:
        if self.nbits == 0 and not self._fill():
            raise ValueError("jpeg: entropy data truncated")
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_and_expect_rst(self, n: int) -> None:
        """Byte-align and consume the RSTn marker at a restart boundary."""
        self.bitbuf = 0
        self.nbits = 0
        if (
            self.pos + 1 < len(self.data)
            and self.data[self.pos] == 0xFF
            and self.data[self.pos + 1] == 0xD0 + (n & 7)
        ):
            self.pos += 2
            self.marker = None
        else:
            raise ValueError("jpeg: missing restart marker")

    def decode_symbol(self, table: _HuffDecoder) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("jpeg: invalid Huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t received bits to a signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def decode_jpeg(data: bytes) -> np.ndarray:
    """JPEG bytes -> uint8 array (h, w) for grayscale, (h, w, 3) for YCbCr.

    Raises ``ValueError`` on malformed bytes and ``NotImplementedError``
    on valid-but-unsupported streams (progressive/arithmetic/12-bit).
    """
    if data[:2] != JPEG_SIGNATURE:
        raise ValueError("not a JPEG: bad SOI")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffDecoder] = {}
    huff_ac: dict[int, _HuffDecoder] = {}
    restart_interval = 0
    frame: dict | None = None

    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"jpeg: expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            raise ValueError("jpeg: EOI before SOS")
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue  # TEM / stray RST: no payload
        (seg_len,) = struct.unpack(">H", data[pos : pos + 2])
        seg = data[pos + 2 : pos + seg_len]
        seg_end = pos + seg_len
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                if pq != 0:
                    raise NotImplementedError("jpeg: 16-bit quant tables")
                tbl = np.frombuffer(seg[i + 1 : i + 65], dtype=np.uint8).astype(np.int32)
                qt[tq] = tbl
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                counts = list(seg[i + 1 : i + 17])
                n = sum(counts)
                symbols = seg[i + 17 : i + 17 + n]
                (huff_dc if tc == 0 else huff_ac)[th] = _HuffDecoder(counts, symbols)
                i += 17 + n
        elif marker in (0xC0, 0xC1):  # SOF0 / SOF1 (both Huffman sequential)
            prec = seg[0]
            if prec != 8:
                raise NotImplementedError("jpeg: only 8-bit precision")
            h_img, w_img = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            if ncomp not in (1, 3):
                raise NotImplementedError("jpeg: only 1 or 3 components")
            comps = []
            for c in range(ncomp):
                cid = seg[6 + c * 3]
                hv = seg[7 + c * 3]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 15, "tq": seg[8 + c * 3]}
                )
            frame = {"h": h_img, "w": w_img, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError("jpeg: only baseline/extended sequential Huffman")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[0:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("jpeg: SOS before SOF")
            ns = seg[0]
            scan_sel = {}
            for c in range(ns):
                cs = seg[1 + c * 2]
                tda = seg[2 + c * 2]
                scan_sel[cs] = (tda >> 4, tda & 15)
            return _decode_scan(
                data, seg_end, frame, scan_sel, qt, huff_dc, huff_ac, restart_interval
            )
        # APPn / COM / others: skip
        pos = seg_end
    raise ValueError("jpeg: no SOS found")


def _decode_scan(
    data: bytes,
    pos: int,
    frame: dict,
    scan_sel: dict,
    qt: dict,
    huff_dc: dict,
    huff_ac: dict,
    restart_interval: int,
) -> np.ndarray:
    comps = frame["comps"]
    h_img, w_img = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w_img // (8 * hmax))
    mcuy = -(-h_img // (8 * vmax))

    reader = _BitReader(data, pos)
    # per component: zigzag coefficient rows, one row of 64 per block,
    # in MCU-major order (vectorized dequant+IDCT afterwards)
    coef_rows: list[list[np.ndarray]] = [[] for _ in comps]
    preds = [0] * len(comps)
    row_buf = np.zeros(64, dtype=np.int32)

    n_mcu = mcux * mcuy
    rst_count = 0
    for m in range(n_mcu):
        if restart_interval and m > 0 and m % restart_interval == 0:
            reader.align_and_expect_rst(rst_count)
            rst_count = (rst_count + 1) & 7
            preds = [0] * len(comps)
        for ci, comp in enumerate(comps):
            td, ta = scan_sel[comp["id"]]
            dc_tbl = huff_dc[td]
            ac_tbl = huff_ac[ta]
            for _ in range(comp["h"] * comp["v"]):
                row_buf[:] = 0
                t = reader.decode_symbol(dc_tbl)
                diff = _extend(reader.read_bits(t), t) if t else 0
                preds[ci] += diff
                row_buf[0] = preds[ci]
                k = 1
                while k < 64:
                    rs = reader.decode_symbol(ac_tbl)
                    r, s = rs >> 4, rs & 15
                    if s == 0:
                        if r == 15:
                            k += 16
                            continue
                        break  # EOB
                    k += r
                    if k > 63:
                        raise ValueError("jpeg: AC run past block end")
                    row_buf[k] = _extend(reader.read_bits(s), s)
                    k += 1
                coef_rows[ci].append(row_buf.copy())

    planes = []
    for ci, comp in enumerate(comps):
        q = qt[comp["tq"]].astype(np.int32)
        zz = np.stack(coef_rows[ci]) if coef_rows[ci] else np.zeros((0, 64), np.int32)
        deq = (zz * q).astype(np.float64)
        blocks = np.zeros((len(deq), 64))
        blocks[:, _ZZ_FLAT] = deq  # de-zigzag
        spatial = _idct_blocks(blocks.reshape(-1, 8, 8)) + 128.0
        spatial = np.clip(np.round(spatial), 0, 255).astype(np.uint8)
        # blocks are MCU-major, comp['h'] x comp['v'] per MCU
        ch, cv = comp["h"], comp["v"]
        plane = np.zeros((mcuy * cv * 8, mcux * ch * 8), dtype=np.uint8)
        bi = 0
        for m in range(mcux * mcuy):
            my, mx = divmod(m, mcux)
            for by in range(cv):
                for bx in range(ch):
                    y0 = (my * cv + by) * 8
                    x0 = (mx * ch + bx) * 8
                    plane[y0 : y0 + 8, x0 : x0 + 8] = spatial[bi]
                    bi += 1
        # upsample to full resolution (nearest), crop to image size
        plane = plane.repeat(vmax // cv, axis=0).repeat(hmax // ch, axis=1)
        planes.append(plane[:h_img, :w_img])

    if len(planes) == 1:
        return planes[0]
    y = planes[0].astype(np.float64)
    cb = planes[1].astype(np.float64) - 128.0
    cr = planes[2].astype(np.float64) - 128.0
    # JFIF / CCIR 601 full-range conversion
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


class _BitWriter:
    __slots__ = ("out", "bitbuf", "nbits")

    def __init__(self) -> None:
        self.out = bytearray()
        self.bitbuf = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.bitbuf = (self.bitbuf << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.bitbuf >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _amplitude_bits(v: int, t: int) -> int:
    return v if v >= 0 else v + (1 << t) - 1


def _plane_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) uint8 plane (H, W multiples of 8) -> (n, 8, 8) row-major."""
    hh, ww = plane.shape
    return (
        plane.reshape(hh // 8, 8, ww // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def _pad_to(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
    """Edge-replicate pad a plane up to multiples of (mh, mw)."""
    hh, ww = plane.shape
    ph = (-hh) % mh
    pw = (-ww) % mw
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def _quantize_plane(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """uint8 plane -> (n_blocks, 64) zigzag quantized int32 coefficients."""
    blocks = _plane_blocks(plane).astype(np.float64) - 128.0
    coefs = _fdct_blocks(blocks)
    zz = coefs.reshape(-1, 64)[:, _ZZ_FLAT]
    return np.round(zz / q).astype(np.int32)


def _block_symbols(zz_row: np.ndarray, pred: int) -> tuple[int, list, int]:
    """One quantized zigzag block -> (dc_category, [(sym, bits, nbits)...], new_pred).

    The list holds the AC token stream; the DC token is returned
    separately since it uses the DC table."""
    dc = int(zz_row[0])
    diff = dc - pred
    t = _category(diff)
    tokens = []
    nz = np.flatnonzero(zz_row[1:]) + 1
    k = 1
    for idx in nz:
        run = int(idx) - k
        while run > 15:
            tokens.append((0xF0, 0, 0))
            run -= 16
        v = int(zz_row[idx])
        s = _category(v)
        tokens.append(((run << 4) | s, _amplitude_bits(v, s), s))
        k = int(idx) + 1
    if k < 64:
        tokens.append((0x00, 0, 0))  # EOB
    return t, tokens, dc


def encode_jpeg(
    img: np.ndarray,
    quant: "int | np.ndarray" = 1,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """uint8 (h, w) grayscale or (h, w, 3) RGB -> baseline JPEG bytes.

    ``quant`` is a scalar step applied to every coefficient or a
    64-entry zigzag table (applied to all components). The encoder
    builds its own canonical Huffman tables from the token stream (any
    valid DHT is legal), so the bytes are fully self-describing.
    """
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    if not gray and (img.ndim != 3 or img.shape[2] != 3):
        raise ValueError("encode_jpeg wants (h,w) or (h,w,3) uint8")
    if subsampling not in ("444", "420", "422"):
        raise ValueError(subsampling)
    h_img, w_img = img.shape[0], img.shape[1]
    q = (
        np.full(64, int(quant), dtype=np.float64)
        if np.isscalar(quant)
        else np.asarray(quant, dtype=np.float64).reshape(64)
    )

    if gray:
        comps = [{"id": 1, "h": 1, "v": 1, "plane": img}]
    else:
        rgbf = img.astype(np.float64)
        r, g, b = rgbf[..., 0], rgbf[..., 1], rgbf[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        ch_, cv_ = (1, 1) if subsampling == "444" else ((2, 1) if subsampling == "422" else (2, 2))

        def box(p: np.ndarray) -> np.ndarray:
            if ch_ == 1 and cv_ == 1:
                return p
            ph = _pad_to(p, cv_, ch_)
            hh, ww = ph.shape
            return ph.reshape(hh // cv_, cv_, ww // ch_, ch_).mean(axis=(1, 3))

        to_u8 = lambda p: np.clip(np.round(p), 0, 255).astype(np.uint8)
        comps = [
            {"id": 1, "h": ch_, "v": cv_, "plane": to_u8(y)},
            {"id": 2, "h": 1, "v": 1, "plane": to_u8(box(cb))},
            {"id": 3, "h": 1, "v": 1, "plane": to_u8(box(cr))},
        ]

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w_img // (8 * hmax))
    mcuy = -(-h_img // (8 * vmax))

    # quantize each component plane, then order blocks MCU-major
    comp_zz = []
    for c in comps:
        want_h = mcuy * c["v"] * 8
        want_w = mcux * c["h"] * 8
        plane = _pad_to(c["plane"], want_h, want_w)[:want_h, :want_w]
        # _pad_to pads to multiples; force exact MCU-grid size
        if plane.shape != (want_h, want_w):
            plane = np.pad(
                plane,
                ((0, want_h - plane.shape[0]), (0, want_w - plane.shape[1])),
                mode="edge",
            )
        zz = _quantize_plane(plane, q)
        comp_zz.append((zz, want_w // 8))

    # token pass: gather symbols per (dc/ac, luma/chroma) table class
    n_mcu = mcux * mcuy
    mcu_tokens: list[list] = []
    preds = [0] * len(comps)
    dc_syms: list[set] = [set(), set()]
    ac_syms: list[set] = [set(), set()]
    for m in range(n_mcu):
        my, mx = divmod(m, mcux)
        if restart_interval and m > 0 and m % restart_interval == 0:
            preds = [0] * len(comps)
        toks = []
        for ci, c in enumerate(comps):
            zz, bw = comp_zz[ci]
            tclass = 0 if ci == 0 else 1
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    bi = (my * c["v"] + by) * bw + (mx * c["h"] + bx)
                    t, ac, dc = _block_symbols(zz[bi], preds[ci])
                    diff = dc - preds[ci]
                    preds[ci] = dc
                    dc_syms[tclass].add(t)
                    for sym, _, _ in ac:
                        ac_syms[tclass].add(sym)
                    toks.append((tclass, t, _amplitude_bits(diff, t), ac))
        mcu_tokens.append(toks)

    n_classes = 1 if gray else 2
    dc_tables = [_fixed_length_table(dc_syms[i]) for i in range(n_classes)]
    ac_tables = [_fixed_length_table(ac_syms[i]) for i in range(n_classes)]
    dc_codes = [_canonical_codes(*t) for t in dc_tables]
    ac_codes = [_canonical_codes(*t) for t in ac_tables]

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    qtb = np.clip(np.round(q), 1, 255).astype(np.uint8).tobytes()
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + qtb  # DQT id 0
    sof = struct.pack(">BHHB", 8, h_img, w_img, len(comps))
    for c in comps:
        sof += bytes([c["id"], (c["h"] << 4) | c["v"], 0])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    for tc, tables in ((0, dc_tables), (1, ac_tables)):
        for th, (counts, symbols) in enumerate(tables):
            body = bytes([(tc << 4) | th]) + bytes(counts) + symbols
            out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([len(comps)])
    for ci, c in enumerate(comps):
        th = 0 if ci == 0 else (1 if not gray else 0)
        sos += bytes([c["id"], (th << 4) | th])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    w = _BitWriter()
    rst = 0
    for m, toks in enumerate(mcu_tokens):
        if restart_interval and m > 0 and m % restart_interval == 0:
            w.flush()
            out += w.out
            w = _BitWriter()
            out += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) & 7
        for tclass, t, diff_bits, ac in toks:
            length, code = dc_codes[min(tclass, n_classes - 1)][t]
            w.write(code, length)
            if t:
                w.write(diff_bits, t)
            actab = ac_codes[min(tclass, n_classes - 1)]
            for sym, bits, nbits in ac:
                length, code = actab[sym]
                w.write(code, length)
                if nbits:
                    w.write(bits, nbits)
    w.flush()
    out += w.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
