"""Minimal from-scratch PDF text-item extractor (C4 byte decode).

The reference converts PDFs with pdfjs (``src/converting.ts:43-145``):
``getTextContent()`` yields items ``{str, height, hasEOL, dir}`` per page,
which the heading-histogram heuristic consumes. This module produces the
same item stream for a DOCUMENTED SUBSET of PDF, written against the
public PDF 1.7 spec (ISO 32000-1) with only the stdlib (``zlib``):

Supported:
- classic ``N G obj ... endobj`` bodies discovered by a full-file scan
  (robust to broken xref tables), plus objects inside /ObjStm object
  streams (PDF 1.5 compressed objects)
- /Catalog -> /Pages -> /Kids page-tree walk; /Contents as a direct
  stream, a reference, or an array of references
- stream filters: none, /FlateDecode (zlib), /LZWDecode (9→12-bit codes
  + EarlyChange), /ASCIIHexDecode, /RunLengthDecode — image codecs
  (DCT/JPX/CCITT) and crypt filters excluded; /Length direct or ref.
  DCT/JPX/CCITT image XOBJECTS pass through un-decoded (text extraction
  never touches their bytes; only an explicit decode of such a stream
  raises), and inline images (BI/ID/EI) are skipped in the content
  tokenizer so raw JPEG bytes never reach the text path
- content text operators: BT/ET, Tf, Tm, Td, TD, T*, TL, Tj, ', ", TJ
- literal ``( )`` strings with escapes + octal, hex ``< >`` strings
- per-font text decode via /ToUnicode CMaps (bfchar + bfrange, scalar
  and array forms, codespacerange-derived code width): Type0/Identity-H
  2-byte codes and simple-font 1-byte codes both map through the CMap
  like pdfjs does. Fonts WITHOUT a ToUnicode map fall back to latin-1
  (1-byte) or ``chr(code)`` (2-byte Identity) — embedded-CMap CID->GID
  resolution (the full pdfjs path) stays out of subset.

- encryption: the Standard security handler with an empty user
  password — the common "encrypted for permissions, readable by
  anyone" case pdfjs opens without a password: RC4 (V 1/2, R 2/3,
  40..128-bit) and V4/R4 crypt filters with /StdCF /CFM of /AESV2
  (AES-128-CBC, from-scratch FIPS-197 core pinned to the published
  known-answer vectors), /V2 (RC4-128) or /Identity; per-object keys
  via MD5 (PDF 1.7 §7.6.3 Algorithms 1/2/4/5, + the AESV2 ``sAlT``),
  streams decrypted before filters

- /Predictor on Flate/LZW DecodeParms: TIFF horizontal differencing and
  the full PNG filter set (the xref-stream / ObjStm layout)

Not supported (raise ``ValueError`` -> converter error channel, the
reference's HTTP 400 analog): password-protected files (user-password
check fails), AES-256 (/V 5 /AESV3 — different SHA-256 key
derivation), non-/StdCF crypt filters, non-Standard handlers,
filters other than the list above, xref-stream-only files whose objects
are all in object streams we fail to locate, vertical writing modes.

Item semantics vs pdfjs: ``height`` = font size scaled by the text
matrix's vertical axis (``|| (c, d) ||`` of Tm), which equals pdfjs's
item height for unrotated text; ``hasEOL`` is set on the last item of a
line when a line-advance operator (Td/TD/T*/'/") or ET follows, matching
how pdfjs marks line breaks for simple layouts; ``dir`` is always
``ltr`` (no vertical writing modes in the subset).
"""

from __future__ import annotations

import re
import zlib

__all__ = ["extract_pdf_items", "PdfError"]


class PdfError(ValueError):
    """Malformed or out-of-subset PDF."""


# --- object model -----------------------------------------------------------


class Ref:
    __slots__ = ("num", "gen")

    def __init__(self, num: int, gen: int):
        self.num = num
        self.gen = gen

    def __repr__(self):  # pragma: no cover - debug aid
        return f"{self.num} {self.gen} R"


class Name(str):
    """PDF name (distinct from strings)."""


class Stream:
    __slots__ = ("dict", "raw", "num", "gen")

    def __init__(self, d: dict, raw: bytes):
        self.dict = d
        self.raw = raw
        self.num: int | None = None  # owning indirect object, for decrypt
        self.gen: int = 0


_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class _Lexer:
    """Tokenizer for PDF object syntax (dicts, arrays, numbers, strings)."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def _skip_ws(self) -> None:
        d, n = self.data, len(self.data)
        while self.pos < n:
            c = d[self.pos]
            if c in _WS:
                self.pos += 1
            elif c == 0x25:  # '%' comment
                while self.pos < n and d[self.pos] not in b"\r\n":
                    self.pos += 1
            else:
                return

    def parse_object(self):
        self._skip_ws()
        d = self.data
        if self.pos >= len(d):
            raise PdfError("unexpected end of data")
        c = d[self.pos]
        if d.startswith(b"<<", self.pos):
            return self._parse_dict()
        if c == 0x3C:  # '<' hex string
            return self._parse_hex_string()
        if c == 0x28:  # '('
            return self._parse_literal_string()
        if c == 0x2F:  # '/'
            return self._parse_name()
        if c == 0x5B:  # '['
            return self._parse_array()
        if d.startswith(b"true", self.pos):
            self.pos += 4
            return True
        if d.startswith(b"false", self.pos):
            self.pos += 5
            return False
        if d.startswith(b"null", self.pos):
            self.pos += 4
            return None
        return self._parse_number_or_ref()

    def _parse_dict(self) -> dict:
        self.pos += 2
        out: dict = {}
        while True:
            self._skip_ws()
            if self.data.startswith(b">>", self.pos):
                self.pos += 2
                return out
            key = self.parse_object()
            if not isinstance(key, Name):
                raise PdfError("dict key is not a name")
            out[str(key)] = self.parse_object()

    def _parse_array(self) -> list:
        self.pos += 1
        out = []
        while True:
            self._skip_ws()
            if self.pos < len(self.data) and self.data[self.pos] == 0x5D:  # ']'
                self.pos += 1
                return out
            out.append(self.parse_object())

    def _parse_name(self) -> Name:
        self.pos += 1
        d, n = self.data, len(self.data)
        start = self.pos
        out = bytearray()
        while self.pos < n:
            c = d[self.pos]
            if c in _WS or c in _DELIM:
                break
            if c == 0x23 and self.pos + 2 < n:  # '#' hex escape
                out += bytes([int(d[self.pos + 1 : self.pos + 3], 16)])
                self.pos += 3
            else:
                out.append(c)
                self.pos += 1
        if not out and start == self.pos:
            raise PdfError("empty name")
        return Name(out.decode("latin-1"))

    def _parse_literal_string(self) -> bytes:
        self.pos += 1
        d, n = self.data, len(self.data)
        out = bytearray()
        depth = 1
        while self.pos < n:
            c = d[self.pos]
            if c == 0x5C:  # backslash
                self.pos += 1
                if self.pos >= n:
                    break
                e = d[self.pos]
                esc = {0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8, 0x66: 12,
                       0x28: 40, 0x29: 41, 0x5C: 92}
                if e in esc:
                    out.append(esc[e])
                    self.pos += 1
                elif 0x30 <= e <= 0x37:  # octal
                    oct_digits = bytearray()
                    while (
                        self.pos < n and len(oct_digits) < 3
                        and 0x30 <= d[self.pos] <= 0x37
                    ):
                        oct_digits.append(d[self.pos])
                        self.pos += 1
                    out.append(int(oct_digits, 8) & 0xFF)
                elif e in b"\r\n":  # line continuation
                    self.pos += 1
                    if e == 0x0D and self.pos < n and d[self.pos] == 0x0A:
                        self.pos += 1
                else:
                    out.append(e)
                    self.pos += 1
            elif c == 0x28:
                depth += 1
                out.append(c)
                self.pos += 1
            elif c == 0x29:
                depth -= 1
                self.pos += 1
                if depth == 0:
                    return bytes(out)
                out.append(c)
            else:
                out.append(c)
                self.pos += 1
        raise PdfError("unterminated string")

    def _parse_hex_string(self) -> bytes:
        self.pos += 1
        end = self.data.find(b">", self.pos)
        if end == -1:
            raise PdfError("unterminated hex string")
        hexed = re.sub(rb"[^0-9A-Fa-f]", b"", self.data[self.pos : end])
        self.pos = end + 1
        if len(hexed) % 2:
            hexed += b"0"
        return bytes.fromhex(hexed.decode("ascii"))

    _NUM = re.compile(rb"[+-]?(?:\d+\.\d*|\.\d+|\d+)")

    def _parse_number_or_ref(self):
        m = self._NUM.match(self.data, self.pos)
        if not m:
            raise PdfError(f"bad token at {self.pos}")
        self.pos = m.end()
        text = m.group()
        if b"." in text:
            return float(text)
        value = int(text)
        # lookahead for "G R" (indirect reference)
        save = self.pos
        self._skip_ws()
        m2 = self._NUM.match(self.data, self.pos)
        if m2 and b"." not in m2.group():
            after = m2.end()
            probe = _Lexer(self.data, after)
            probe._skip_ws()
            if probe.data.startswith(b"R", probe.pos) and (
                probe.pos + 1 >= len(probe.data)
                or probe.data[probe.pos + 1] in _WS + _DELIM
            ):
                self.pos = probe.pos + 1
                return Ref(value, int(m2.group()))
        self.pos = save
        return value


# --- document ---------------------------------------------------------------

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b", re.S)

# ---------------------------------------------------------------------------
# Standard security handler (PDF 1.7 §7.6): RC4 + MD5 key derivation.
# RC4 is the public stream cipher (symmetric: encrypt == decrypt).

_PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)


def _rc4(key: bytes, data: bytes) -> bytes:
    s = list(range(256))
    j = 0
    for i in range(256):
        j = (j + s[i] + key[i % len(key)]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for idx, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[idx] = c ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


def _md5(b: bytes) -> bytes:
    import hashlib

    return hashlib.md5(b).digest()


def _std_file_key(
    user_pw: bytes,
    o: bytes,
    p: int,
    id0: bytes,
    r: int,
    n: int,
    encrypt_metadata: bool = True,
) -> bytes:
    """Algorithm 2: the file encryption key. R4 with
    /EncryptMetadata false appends ffffffff to the hash input."""
    h = _md5(
        (user_pw + _PAD)[:32]
        + o[:32]
        + (p & 0xFFFFFFFF).to_bytes(4, "little")
        + id0
        + (b"\xff\xff\xff\xff" if r >= 4 and not encrypt_metadata else b"")
    )
    if r >= 3:
        for _ in range(50):
            h = _md5(h[:n])
    return h[:n]


def _check_user_password(key: bytes, u: bytes, id0: bytes, r: int) -> bool:
    """Algorithms 4 (R2) / 5 (R3): does the derived key open the file?"""
    if r == 2:
        return _rc4(key, _PAD) == u[:32]
    x = _rc4(key, _md5(_PAD + id0))
    for i in range(1, 20):
        x = _rc4(bytes(b ^ i for b in key), x)
    return x == u[:16]


def _object_key(file_key: bytes, num: int, gen: int, aes: bool = False) -> bytes:
    """Algorithm 1: the per-object key. For AESV2 the spec appends the
    fixed salt ``sAlT`` (73 41 6C 54) to the MD5 input."""
    h = _md5(
        file_key
        + (num & 0xFFFFFF).to_bytes(3, "little")
        + (gen & 0xFFFF).to_bytes(2, "little")
        + (b"sAlT" if aes else b"")
    )
    return h[: min(len(file_key) + 5, 16)]


# AES-128 (FIPS-197), from scratch for the /AESV2 crypt filter. The
# S-box and GF(2^8) multiply tables are GENERATED from the spec's
# definitions (multiplicative inverse + affine transform; xtime with the
# 0x1B reduction polynomial) rather than transcribed — no 256-entry
# literal to typo — and the block cipher is pinned to the FIPS-197
# Appendix C.1 / NIST SP 800-38A F.2 known-answer vectors in
# tests/test_pdf.py, plus a round-trip against an independent in-test
# encryptor (the same discipline as the RC4 fixtures).


def _gf_mul(a: int, b: int) -> int:
    p = 0
    for _ in range(8):
        if b & 1:
            p ^= a
        hi = a & 0x80
        a = (a << 1) & 0xFF
        if hi:
            a ^= 0x1B
        b >>= 1
    return p


_AES_TABLES: dict | None = None


def _aes_tables() -> dict:
    """Lazily build (and cache) the S-box, inverse S-box and the
    InvMixColumns multiply tables."""
    global _AES_TABLES
    if _AES_TABLES is not None:
        return _AES_TABLES
    # multiplicative inverses via the group generator 3 (log/antilog)
    exp = [0] * 256
    log = [0] * 256
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        x = _gf_mul(x, 3)
    inv = [0] * 256
    for v in range(1, 256):
        inv[v] = exp[(255 - log[v]) % 255]
    sbox = [0] * 256
    for v in range(256):
        b = inv[v]
        res = 0
        for i in range(8):
            bit = (
                (b >> i)
                ^ (b >> ((i + 4) % 8))
                ^ (b >> ((i + 5) % 8))
                ^ (b >> ((i + 6) % 8))
                ^ (b >> ((i + 7) % 8))
                ^ (0x63 >> i)
            ) & 1
            res |= bit << i
        sbox[v] = res
    inv_sbox = [0] * 256
    for v in range(256):
        inv_sbox[sbox[v]] = v
    mul = {c: [_gf_mul(v, c) for v in range(256)] for c in (2, 3, 9, 11, 13, 14)}
    _AES_TABLES = {"sbox": sbox, "inv_sbox": inv_sbox, "mul": mul}
    return _AES_TABLES


def _aes128_round_keys(key: bytes) -> list[list[int]]:
    """Key expansion (FIPS-197 §5.2): 11 round keys of 16 bytes."""
    t = _aes_tables()
    sbox = t["sbox"]
    w = [list(key[4 * i : 4 * i + 4]) for i in range(4)]
    rcon = 1
    for i in range(4, 44):
        tmp = list(w[i - 1])
        if i % 4 == 0:
            tmp = [sbox[tmp[1]], sbox[tmp[2]], sbox[tmp[3]], sbox[tmp[0]]]
            tmp[0] ^= rcon
            rcon = _gf_mul(rcon, 2)
        w.append([a ^ b for a, b in zip(w[i - 4], tmp)])
    return [sum(w[4 * r : 4 * r + 4], []) for r in range(11)]


def _aes128_encrypt_block(rk: list[list[int]], block: bytes) -> bytes:
    """Forward cipher — needed by CBC decrypt's test twin and kept next
    to the decryptor so the KAT suite can pin both directions."""
    t = _aes_tables()
    sbox, mul = t["sbox"], t["mul"]
    s = [b ^ k for b, k in zip(block, rk[0])]
    for rnd in range(1, 11):
        s = [sbox[v] for v in s]
        # ShiftRows: row r (byte index i%4) rotates left by r columns
        s = [s[(4 * ((i // 4) + (i % 4)) + (i % 4)) % 16] for i in range(16)]
        if rnd < 10:
            m2, m3 = mul[2], mul[3]
            ns = list(s)
            for c in range(0, 16, 4):
                a0, a1, a2, a3 = s[c : c + 4]
                ns[c] = m2[a0] ^ m3[a1] ^ a2 ^ a3
                ns[c + 1] = a0 ^ m2[a1] ^ m3[a2] ^ a3
                ns[c + 2] = a0 ^ a1 ^ m2[a2] ^ m3[a3]
                ns[c + 3] = m3[a0] ^ a1 ^ a2 ^ m2[a3]
            s = ns
        s = [v ^ k for v, k in zip(s, rk[rnd])]
    return bytes(s)


def _aes128_decrypt_block(rk: list[list[int]], block: bytes) -> bytes:
    """Inverse cipher (FIPS-197 §5.3, straightforward structure)."""
    t = _aes_tables()
    inv_sbox, mul = t["inv_sbox"], t["mul"]
    m9, m11, m13, m14 = mul[9], mul[11], mul[13], mul[14]
    s = [b ^ k for b, k in zip(block, rk[10])]
    for rnd in range(9, -1, -1):
        # InvShiftRows: row r rotates right by r columns
        s = [s[(4 * ((i // 4) - (i % 4)) + (i % 4)) % 16] for i in range(16)]
        s = [inv_sbox[v] for v in s]
        s = [v ^ k for v, k in zip(s, rk[rnd])]
        if rnd > 0:
            ns = list(s)
            for c in range(0, 16, 4):
                a0, a1, a2, a3 = s[c : c + 4]
                ns[c] = m14[a0] ^ m11[a1] ^ m13[a2] ^ m9[a3]
                ns[c + 1] = m9[a0] ^ m14[a1] ^ m11[a2] ^ m13[a3]
                ns[c + 2] = m13[a0] ^ m9[a1] ^ m14[a2] ^ m11[a3]
                ns[c + 3] = m11[a0] ^ m13[a1] ^ m9[a2] ^ m14[a3]
            s = ns
    return bytes(s)


def _aes_cbc_decrypt(key: bytes, data: bytes) -> bytes:
    """AESV2 stream layout (PDF 1.7 §7.6.2): a 16-byte IV prefix, then
    CBC ciphertext with RFC 2898 padding — validated loudly, never
    silently truncated."""
    if len(data) < 32 or len(data) % 16:
        raise PdfError("AES stream not a 16-byte-block multiple with IV")
    rk = _aes128_round_keys(key)
    prev = data[:16]
    out = bytearray()
    for off in range(16, len(data), 16):
        blk = data[off : off + 16]
        out += bytes(a ^ b for a, b in zip(_aes128_decrypt_block(rk, blk), prev))
        prev = blk
    pad = out[-1]
    if not 1 <= pad <= 16 or out[-pad:] != bytes([pad]) * pad:
        raise PdfError("bad AES padding (wrong key or corrupt stream)")
    return bytes(out[:-pad])


def _unpredict(data: bytes, pred: int, colors: int, bpc: int, cols: int) -> bytes:
    """Undo /Predictor on a decoded Flate/LZW stream (PDF 1.7 §7.4.4.4):
    TIFF horizontal differencing (2, 8-bit only) and the PNG filter set
    (>= 10) — the layout xref streams and ObjStms commonly use."""
    row = (cols * colors * bpc + 7) // 8
    # PNG filter unit: CEIL of bits-per-pixel over 8 (a 12-bit pixel
    # filters with a 2-byte left neighbor), never the floor
    bpp = max(1, (colors * bpc + 7) // 8)
    if pred == 2:
        if bpc != 8:
            raise PdfError("TIFF predictor with BitsPerComponent != 8")
        out = bytearray(data)
        for r0 in range(0, len(out) - row + 1, row):
            for i in range(r0 + bpp, r0 + row):
                out[i] = (out[i] + out[i - bpp]) & 0xFF
        return bytes(out)

    def paeth(a: int, b: int, c: int) -> int:
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    out = bytearray()
    prev = bytes(row)
    pos = 0
    while pos + 1 + row <= len(data):
        ftype = data[pos]
        cur = bytearray(data[pos + 1 : pos + 1 + row])
        pos += 1 + row
        if ftype == 1:  # Sub
            for i in range(bpp, row):
                cur[i] = (cur[i] + cur[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(row):
                cur[i] = (cur[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(row):
                left = cur[i - bpp] if i >= bpp else 0
                cur[i] = (cur[i] + (left + prev[i]) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(row):
                left = cur[i - bpp] if i >= bpp else 0
                ul = prev[i - bpp] if i >= bpp else 0
                cur[i] = (cur[i] + paeth(left, prev[i], ul)) & 0xFF
        elif ftype != 0:
            raise PdfError(f"unknown PNG predictor filter type {ftype}")
        out += cur
        prev = cur
    if pos != len(data):  # trailing partial row: loud, not silent drop
        raise PdfError("truncated predictor stream (partial trailing row)")
    return bytes(out)


def _ascii_hex_decode(data: bytes) -> bytes:
    """ASCIIHexDecode (ISO 32000-1 §7.4.2): hex pairs, whitespace
    ignored, '>' is EOD, an odd trailing digit pads with 0."""
    digits = []
    for b in data:
        c = chr(b)
        if c == ">":
            break
        if c.isspace():
            continue
        if c not in "0123456789abcdefABCDEF":
            raise PdfError(f"bad ASCIIHex byte {c!r}")
        digits.append(c)
    if len(digits) % 2:
        digits.append("0")
    return bytes.fromhex("".join(digits))


def _run_length_decode(data: bytes) -> bytes:
    """RunLengthDecode (§7.4.5): L<128 copies L+1 literals, L>128
    repeats the next byte 257-L times, 128 is EOD."""
    out = bytearray()
    i = 0
    while i < len(data):
        length = data[i]
        if length == 128:
            break
        if length < 128:
            chunk = data[i + 1 : i + 2 + length]
            if len(chunk) != length + 1:
                raise PdfError("truncated RunLength literal")
            out += chunk
            i += 2 + length
        else:
            if i + 1 >= len(data):
                raise PdfError("truncated RunLength run")
            out += data[i + 1 : i + 2] * (257 - length)
            i += 2
    return bytes(out)


def _lzw_decode(data: bytes, early: int = 1) -> bytes:
    """LZWDecode (§7.4.4): 9→12-bit codes, 256=clear, 257=EOD;
    ``early`` is the EarlyChange parameter (default 1: the code width
    grows one code sooner, the PDF default)."""
    out = bytearray()
    base = {i: bytes([i]) for i in range(256)}
    table = dict(base)
    next_code = 258
    width = 9
    buf = 0
    nbits = 0
    prev: bytes | None = None
    for byte in data:
        buf = (buf << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (buf >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == 256:
                table = dict(base)
                next_code = 258
                width = 9
                prev = None
                continue
            if code == 257:
                return bytes(out)
            if prev is None:
                entry = table.get(code)
                if entry is None:
                    raise PdfError("bad LZW start code")
            elif code in table:
                entry = table[code]
            elif code == next_code:
                entry = prev + prev[:1]
            else:
                raise PdfError("bad LZW code")
            out += entry
            if prev is not None and next_code < 4096:
                table[next_code] = prev + entry[:1]
                next_code += 1
            prev = entry
            # spec schedule: with EarlyChange=1 the 9->10 switch happens
            # when entry 511 is added (next_code + 1 == 512), one code
            # earlier than the GIF/early=0 convention
            if width < 12 and next_code + early >= (1 << width):
                width += 1
    return bytes(out)


class _Pdf:
    def __init__(self, buf: bytes):
        if not buf.startswith(b"%PDF-"):
            raise PdfError("missing %PDF header")
        self.buf = buf
        self.objects: dict[int, object] = {}
        self._scan_objects()
        self._check_encrypted()
        self._expand_object_streams()

    # full-file scan: robust against broken/absent xref tables
    def _scan_objects(self) -> None:
        buf = self.buf
        skip_until = 0
        for m in _OBJ_RE.finditer(buf):
            if m.start() < skip_until:
                # header-shaped bytes INSIDE a previous object's measured
                # stream body (compressed data can contain 'N 0 obj')
                continue
            num = int(m.group(1))
            parsed = self._parse_body_at(m.end())
            if parsed is None:
                continue
            obj, end = parsed
            if isinstance(obj, Stream):
                obj.num, obj.gen = num, int(m.group(2))
            self.objects[num] = obj
            if end is not None:
                skip_until = end

    def _parse_body_at(self, start: int):
        """Parse one object starting at ``start``; returns (obj, end)
        where ``end`` is the position just past 'endobj' (None if it
        could not be determined).

        A stream with a DIRECT /Length is measured by that length — never
        by scanning for 'endobj'/'endstream', whose literal bytes can
        legitimately occur inside Flate-compressed data."""
        buf = self.buf
        lex = _Lexer(buf, start)
        try:
            obj = lex.parse_object()
        except PdfError:
            return None
        if isinstance(obj, dict):
            lex._skip_ws()
            if buf.startswith(b"stream", lex.pos):
                p = lex.pos + len(b"stream")
                if buf.startswith(b"\r\n", p):
                    p += 2
                elif buf.startswith(b"\n", p) or buf.startswith(b"\r", p):
                    p += 1
                length = obj.get("Length")
                if isinstance(length, (int, float)) and not isinstance(length, bool):
                    body_end = p + int(length)
                    e = buf.find(b"endobj", body_end)
                    return Stream(obj, buf[p:body_end]), (
                        e + len(b"endobj") if e != -1 else body_end
                    )
                # indirect or absent /Length: fall back to token scans
                e_obj = buf.find(b"endobj", p)
                if isinstance(length, Ref):
                    raw = buf[p : e_obj if e_obj != -1 else len(buf)]
                    e = raw.rfind(b"endstream")
                    raw = raw[:e] if e != -1 else raw
                else:
                    e = buf.find(b"endstream", p)
                    raw = buf[p : e if e != -1 else (e_obj if e_obj != -1 else len(buf))]
                return Stream(obj, raw), (
                    e_obj + len(b"endobj") if e_obj != -1 else None
                )
        e_obj = buf.find(b"endobj", lex.pos)
        return obj, (e_obj + len(b"endobj") if e_obj != -1 else None)

    def _check_encrypted(self) -> None:
        """Set up decryption from the TRAILER'S /Encrypt entry (or an
        XRef stream dict's) — not a whole-buffer byte scan, which
        false-positives on '/Encrypt' inside string/stream content.

        Supported: the Standard security handler with an EMPTY user
        password — the overwhelmingly common "encrypted for
        permissions, readable by anyone" case (PDF 1.7 §7.6.3,
        Algorithms 2/4/5; pdfjs opens these without a password,
        `src/converting.ts:43-145`):

        - RC4 V 1/2, R 2/3 (40..128-bit), and
        - V 4 / R 4 crypt filters with /StdCF as the stream filter and
          /CFM of /AESV2 (AES-128-CBC, FIPS-197-KAT-pinned in
          tests/test_pdf.py), /V2 (RC4-128) or /Identity.

        AES-256 (/V 5, /AESV3 — a different, SHA-256-based key
        derivation), non-/StdCF stream filters, and files that actually
        require a password raise ``PdfError`` (the converter's error
        channel)."""
        self._enc_key: bytes | None = None
        self._stm_cipher: str = "rc4"
        trailers: list[dict] = []
        for m in re.finditer(rb"trailer", self.buf):
            lex = _Lexer(self.buf, m.end())
            try:
                d = lex.parse_object()
            except PdfError:
                continue
            if isinstance(d, dict) and "Encrypt" in d:
                trailers.append(d)
        for obj in self.objects.values():
            d = obj.dict if isinstance(obj, Stream) else obj
            if isinstance(d, dict) and d.get("Type") == "XRef" and "Encrypt" in d:
                trailers.append(d)
        if not trailers:
            return
        tr = trailers[-1]
        enc = self.resolve(tr["Encrypt"])
        if not isinstance(enc, dict):
            raise PdfError("malformed /Encrypt dictionary")
        if str(self.resolve(enc.get("Filter"))) != "Standard":
            raise PdfError("non-Standard security handlers are out of subset")
        v = int(self.resolve(enc.get("V", 0)))
        r = int(self.resolve(enc.get("R", 0)))
        if (v, r) == (4, 4):
            self._stm_cipher = self._v4_stream_cipher(enc)
        elif v not in (1, 2) or r not in (2, 3):
            raise PdfError(
                "only RC4 V1/V2 R2/R3 and V4/R4 (/AESV2 or /V2 crypt "
                "filters) encryption is in subset"
            )
        o = self.resolve(enc.get("O"))
        u = self.resolve(enc.get("U"))
        if not isinstance(o, bytes) or not isinstance(u, bytes):
            raise PdfError("malformed /Encrypt O/U entries")
        p = int(self.resolve(enc.get("P", -1)))
        # /Length defaults: 40 bits through V2, 128 bits for V4 (AESV2
        # keys are always 16 bytes)
        if v == 4:
            n = int(self.resolve(enc.get("Length", 128))) // 8
        elif v == 2:
            n = int(self.resolve(enc.get("Length", 40))) // 8
        else:
            n = 5
        ids = self.resolve(tr.get("ID"))
        id0 = self.resolve(ids[0]) if isinstance(ids, list) and ids else b""
        if not isinstance(id0, bytes):
            id0 = b""
        em = self.resolve(enc.get("EncryptMetadata", True))
        key = _std_file_key(b"", o, p, id0, r, n, encrypt_metadata=bool(em))
        if not _check_user_password(key, u, id0, r):
            raise PdfError("password-protected PDFs are out of subset")
        self._enc_key = key

    def _v4_stream_cipher(self, enc: dict) -> str:
        """Resolve the V4 crypt-filter method for STREAMS: /StmF names a
        filter in /CF (or /Identity); only /StdCF with /CFM of /AESV2,
        /V2 or /None is in subset — everything else raises, loudly,
        rather than emitting garbage text."""
        stmf = str(self.resolve(enc.get("StmF", "Identity")))
        if stmf == "Identity":
            return "identity"
        if stmf != "StdCF":
            raise PdfError(f"non-StdCF stream crypt filter {stmf!r} is out of subset")
        cf = self.resolve(enc.get("CF"))
        cfd = self.resolve(cf.get("StdCF")) if isinstance(cf, dict) else None
        cfm = str(self.resolve(cfd.get("CFM"))) if isinstance(cfd, dict) else "None"
        if cfm == "AESV2":
            return "aes"
        if cfm == "V2":
            return "rc4"
        if cfm == "None":
            return "identity"
        # AESV3 (AES-256, SHA-256 key derivation) lands here by design
        raise PdfError(f"crypt filter method {cfm!r} is out of subset")

    def _expand_object_streams(self) -> None:
        for obj in list(self.objects.values()):
            if isinstance(obj, Stream) and obj.dict.get("Type") == "ObjStm":
                data = self.stream_data(obj)
                n = int(self.resolve(obj.dict.get("N", 0)))
                first = int(self.resolve(obj.dict.get("First", 0)))
                header = data[:first].split()
                for i in range(n):
                    num = int(header[2 * i])
                    off = int(header[2 * i + 1])
                    if num in self.objects:
                        continue
                    lex = _Lexer(data, first + off)
                    self.objects[num] = lex.parse_object()

    def resolve(self, obj, depth: int = 0):
        while isinstance(obj, Ref):
            if depth > 32:
                raise PdfError("reference loop")
            obj = self.objects.get(obj.num)
            depth += 1
        return obj

    def _apply_predictor(self, raw: bytes, parm) -> bytes:
        if not isinstance(parm, dict):
            return raw
        pred = int(self.resolve(parm.get("Predictor", 1)) or 1)
        if pred <= 1:
            return raw
        return _unpredict(
            raw,
            pred,
            int(self.resolve(parm.get("Colors", 1)) or 1),
            int(self.resolve(parm.get("BitsPerComponent", 8)) or 8),
            int(self.resolve(parm.get("Columns", 1)) or 1),
        )

    def stream_data(self, s: Stream) -> bytes:
        filt = self.resolve(s.dict.get("Filter"))
        raw = s.raw
        length = self.resolve(s.dict.get("Length"))
        if isinstance(length, int) and length <= len(raw):
            raw = raw[:length]
        # decrypt BEFORE filters (the spec's layering); XRef streams are
        # never encrypted, and objects inside ObjStm come decrypted with
        # their container
        if (
            self._enc_key is not None
            and s.num is not None
            and self.resolve(s.dict.get("Type")) != "XRef"
            and self._stm_cipher != "identity"
        ):
            if self._stm_cipher == "aes":
                raw = _aes_cbc_decrypt(
                    _object_key(self._enc_key, s.num, s.gen, aes=True), raw
                )
            else:
                raw = _rc4(_object_key(self._enc_key, s.num, s.gen), raw)
        if filt is None:
            return raw
        filters = filt if isinstance(filt, list) else [filt]
        parms = self.resolve(s.dict.get("DecodeParms"))
        parms_list = parms if isinstance(parms, list) else [parms] * len(filters)
        if len(parms_list) < len(filters):
            # malformed-but-seen: /DecodeParms array shorter than /Filter —
            # missing entries mean "no parms", they must not drop filters
            parms_list = list(parms_list) + [None] * (len(filters) - len(parms_list))
        for f, parm in zip(filters, parms_list):
            f = str(self.resolve(f))
            parm = self.resolve(parm)
            if f == "FlateDecode":
                try:
                    raw = zlib.decompress(raw)
                except zlib.error as exc:
                    raise PdfError(f"bad Flate stream: {exc}") from exc
                raw = self._apply_predictor(raw, parm)
            elif f == "ASCIIHexDecode":
                raw = _ascii_hex_decode(raw)
            elif f == "RunLengthDecode":
                raw = _run_length_decode(raw)
            elif f == "LZWDecode":
                early = 1
                if isinstance(parm, dict):
                    early = int(self.resolve(parm.get("EarlyChange", 1)))
                raw = _lzw_decode(raw, early)
                raw = self._apply_predictor(raw, parm)
            else:
                # image codecs (DCT/JPX/CCITT) and crypt filters stay out
                # of the documented subset
                raise PdfError(f"unsupported stream filter /{f}")
        return raw

    def catalog(self) -> dict:
        for obj in self.objects.values():
            o = obj.dict if isinstance(obj, Stream) else obj
            if isinstance(o, dict) and o.get("Type") == "Catalog":
                return o
        raise PdfError("no /Catalog found")

    def pages(self) -> list[dict]:
        root = self.resolve(self.catalog().get("Pages"))
        if not isinstance(root, dict):
            raise PdfError("catalog has no /Pages")
        out: list[dict] = []

        def walk(node: dict, depth: int = 0) -> None:
            if depth > 64:
                raise PdfError("page tree too deep")
            typ = node.get("Type")
            if typ == "Page":
                out.append(node)
                return
            for kid in self.resolve(node.get("Kids")) or []:
                kid = self.resolve(kid)
                if isinstance(kid, dict):
                    walk(kid, depth + 1)

        walk(root)
        if not out:
            raise PdfError("no pages")
        return out

    def page_content(self, page: dict) -> bytes:
        contents = self.resolve(page.get("Contents"))
        if contents is None:
            return b""
        if isinstance(contents, Stream):
            return self.stream_data(contents)
        if isinstance(contents, list):
            parts = []
            for c in contents:
                c = self.resolve(c)
                if isinstance(c, Stream):
                    parts.append(self.stream_data(c))
            return b"\n".join(parts)
        raise PdfError("unsupported /Contents")


# --- fonts / ToUnicode CMaps --------------------------------------------------


def _cmap_objects(body: bytes):
    """Parse the PDF objects (hex strings / arrays) inside a CMap section."""
    lex = _Lexer(body)
    out = []
    while True:
        lex._skip_ws()
        if lex.pos >= len(body):
            return out
        try:
            out.append(lex.parse_object())
        except PdfError:
            return out


def _utf16(dst: bytes) -> str:
    return dst.decode("utf-16-be", "replace")


def _parse_tounicode(data: bytes) -> tuple[dict[int, str], int]:
    """(code -> unicode string, code width in bytes) from a ToUnicode
    CMap (PDF 32000-1 §9.10.3). Width comes from codespacerange when
    present, else from the first bfchar/bfrange source code."""
    cmap: dict[int, str] = {}
    width = 0
    for sec in re.finditer(rb"begincodespacerange(.*?)endcodespacerange", data, re.S):
        for obj in _cmap_objects(sec.group(1)):
            if isinstance(obj, bytes) and obj:
                width = max(width, len(obj))
    for sec in re.finditer(rb"beginbfchar(.*?)endbfchar", data, re.S):
        objs = _cmap_objects(sec.group(1))
        for i in range(0, len(objs) - 1, 2):
            src, dst = objs[i], objs[i + 1]
            if isinstance(src, bytes) and isinstance(dst, bytes):
                cmap[int.from_bytes(src, "big")] = _utf16(dst)
                width = width or len(src)
    for sec in re.finditer(rb"beginbfrange(.*?)endbfrange", data, re.S):
        objs = _cmap_objects(sec.group(1))
        for i in range(0, len(objs) - 2, 3):
            lo, hi, dst = objs[i], objs[i + 1], objs[i + 2]
            if not (isinstance(lo, bytes) and isinstance(hi, bytes)):
                continue
            lo_i, hi_i = int.from_bytes(lo, "big"), int.from_bytes(hi, "big")
            if hi_i - lo_i > 0x10000:  # malformed-range guard
                continue
            width = width or len(lo)
            if isinstance(dst, list):  # one dst hex string per code
                for off, d in enumerate(dst[: hi_i - lo_i + 1]):
                    if isinstance(d, bytes):
                        cmap[lo_i + off] = _utf16(d)
            elif isinstance(dst, bytes) and dst:
                # incrementing range: only the LAST 16-bit unit increments
                prefix, last = dst[:-2], int.from_bytes(dst[-2:], "big")
                for off in range(hi_i - lo_i + 1):
                    cmap[lo_i + off] = _utf16(
                        prefix + ((last + off) & 0xFFFF).to_bytes(2, "big")
                    )
    return cmap, width


def _parse_cidmap(data: bytes) -> tuple[dict[int, int], int]:
    """(code -> CID, code width) from an EMBEDDED CMap stream used as a
    Type0 font's /Encoding (PDF 32000-1 §9.7.5.3): cidchar + cidrange
    sections; width from codespacerange. Vertical modes / usecmap
    composition stay out of subset (callers fall back to identity)."""
    cid: dict[int, int] = {}
    width = 0
    for sec in re.finditer(rb"begincodespacerange(.*?)endcodespacerange", data, re.S):
        for obj in _cmap_objects(sec.group(1)):
            if isinstance(obj, bytes) and obj:
                width = max(width, len(obj))
    for sec in re.finditer(rb"begincidchar(.*?)endcidchar", data, re.S):
        objs = _cmap_objects(sec.group(1))
        for i in range(0, len(objs) - 1, 2):
            src, dst = objs[i], objs[i + 1]
            if isinstance(src, bytes) and isinstance(dst, int):
                cid[int.from_bytes(src, "big")] = dst
                width = width or len(src)
    for sec in re.finditer(rb"begincidrange(.*?)endcidrange", data, re.S):
        objs = _cmap_objects(sec.group(1))
        for i in range(0, len(objs) - 2, 3):
            lo, hi, start = objs[i], objs[i + 1], objs[i + 2]
            if not (
                isinstance(lo, bytes) and isinstance(hi, bytes) and isinstance(start, int)
            ):
                continue
            lo_i, hi_i = int.from_bytes(lo, "big"), int.from_bytes(hi, "big")
            if hi_i - lo_i > 0x10000:  # malformed-range guard
                continue
            width = width or len(lo)
            for off in range(hi_i - lo_i + 1):
                cid[lo_i + off] = start + off
    return cid, width


class _Font:
    """Per-font text decoder: ToUnicode CMap when present; else an
    embedded-CMap /Encoding maps code->CID and the fallback becomes
    chr(CID); else identity (latin-1 for 1-byte codes, chr(code) for
    2-byte)."""

    def __init__(self, pdf: "_Pdf", font_dict: dict):
        sub = pdf.resolve(font_dict.get("Subtype"))
        enc = pdf.resolve(font_dict.get("Encoding"))
        self.code_bytes = (
            2 if str(sub) == "Type0" or str(enc) in ("Identity-H", "Identity-V") else 1
        )
        self.cmap: dict[int, str] | None = None
        self.cid_map: dict[int, int] | None = None
        if isinstance(enc, Stream):  # embedded CMap (code -> CID)
            cid, width = _parse_cidmap(pdf.stream_data(enc))
            if cid:
                self.cid_map = cid
                if width:
                    self.code_bytes = width
        tu = pdf.resolve(font_dict.get("ToUnicode"))
        if isinstance(tu, Stream):
            cmap, width = _parse_tounicode(pdf.stream_data(tu))
            if cmap:
                self.cmap = cmap
                if width:
                    self.code_bytes = width

    def decode(self, bs: bytes) -> str:
        if self.cmap is None and self.cid_map is None and self.code_bytes == 1:
            return bs.decode("latin-1")
        step = self.code_bytes
        out = []
        for i in range(0, len(bs) - step + 1, step):
            code = int.from_bytes(bs[i : i + step], "big")
            mapped = self.cmap.get(code) if self.cmap is not None else None
            if mapped is None and self.cid_map is not None:
                c = self.cid_map.get(code)
                mapped = chr(c) if c is not None else None
            out.append(mapped if mapped is not None else chr(code))
        rem = len(bs) % step
        if rem:  # trailing short code: keep the raw bytes visible
            out.append(bs[-rem:].decode("latin-1"))
        return "".join(out)


_DEFAULT_FONT = _Font.__new__(_Font)
_DEFAULT_FONT.code_bytes = 1
_DEFAULT_FONT.cmap = None
_DEFAULT_FONT.cid_map = None


# --- content-stream interpretation ------------------------------------------

_OP_RE = re.compile(rb"[A-Za-z'\"][A-Za-z0-9*'\"]*")


def _tokenize_content(data: bytes):
    """Yield ('op', name) / ('operand', value) over a content stream."""
    lex = _Lexer(data)
    n = len(data)
    while True:
        lex._skip_ws()
        if lex.pos >= n:
            return
        c = data[lex.pos]
        if c in b"(<[/" or c in b"+-." or 0x30 <= c <= 0x39:
            # hex string vs dict: '<<' never appears as an operand in text
            # streams we accept — treat '<<' as an inline dict (BDC etc.)
            if data.startswith(b"<<", lex.pos):
                yield ("operand", lex._parse_dict())
            else:
                yield ("operand", lex.parse_object())
            continue
        m = _OP_RE.match(data, lex.pos)
        if not m:
            lex.pos += 1  # skip unknown byte
            continue
        lex.pos = m.end()
        op = m.group().decode("latin-1")
        if op == "ID":
            # inline image (§8.9.7: BI <dict> ID <binary> EI): the binary
            # body (often DCT/JPEG bytes) must NOT reach the tokenizer —
            # skip to the EI delimiter. Text extraction never needs the
            # pixels, so the image passes through un-decoded.
            pos = lex.pos + 1 if lex.pos < n else lex.pos  # 1 ws byte after ID
            while True:
                e = data.find(b"EI", pos)
                if e < 0:
                    lex.pos = n
                    break
                before_ws = e > 0 and data[e - 1] in b"\x00\t\n\f\r "
                after = data[e + 2 : e + 3]
                after_ok = after == b"" or after in (
                    b"\x00", b"\t", b"\n", b"\f", b"\r", b" ", b"/", b"[", b"<", b"("
                )
                if before_ws and after_ok:
                    lex.pos = e + 2
                    break
                pos = e + 2
            continue
        yield ("op", op)


def _page_fonts(pdf: "_Pdf", page: dict) -> dict:
    """Resource-name -> font dict for a page (page-level Resources;
    inherited resources stay out of subset)."""
    res = pdf.resolve(page.get("Resources"))
    if not isinstance(res, dict):
        return {}
    fonts = pdf.resolve(res.get("Font"))
    return fonts if isinstance(fonts, dict) else {}


def extract_pdf_items(buf: bytes) -> list[list[dict]]:
    """pdfjs-shaped text items per page: ``[{str, height, hasEOL, dir}]``.

    See module docstring for subset + semantics. Raises :class:`PdfError`
    on malformed / out-of-subset input.
    """
    pdf = _Pdf(buf)
    pages_out: list[list[dict]] = []
    for page in pdf.pages():
        content = pdf.page_content(page)
        font_dicts = _page_fonts(pdf, page)
        font_cache: dict[str, _Font] = {}
        font = _DEFAULT_FONT
        items: list[dict] = []
        operands: list = []
        size = 0.0
        tm = (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)
        leading = 0.0

        def mark_eol() -> None:
            if items:
                items[-1]["hasEOL"] = True

        def emit(text: str) -> None:
            height = size * (tm[2] ** 2 + tm[3] ** 2) ** 0.5
            items.append(
                {"str": text, "height": height, "hasEOL": False, "dir": "ltr"}
            )

        def _to_text(value) -> str:
            if isinstance(value, bytes):
                return font.decode(value)
            return str(value)

        def _select_font(name) -> "_Font":
            key = str(name)
            if key not in font_cache:
                fd = pdf.resolve(font_dicts.get(key))
                font_cache[key] = (
                    _Font(pdf, fd) if isinstance(fd, dict) else _DEFAULT_FONT
                )
            return font_cache[key]

        for kind, value in _tokenize_content(content):
            if kind == "operand":
                operands.append(value)
                continue
            op = value
            if op == "Tf" and len(operands) >= 2:
                size = float(operands[-1])
                if isinstance(operands[-2], Name):
                    font = _select_font(operands[-2])
            elif op == "Tm" and len(operands) >= 6:
                tm = tuple(float(v) for v in operands[-6:])
            elif op == "TL" and operands:
                leading = float(operands[-1])
            elif op in ("Td", "TD") and len(operands) >= 2:
                if op == "TD":
                    leading = -float(operands[-1])
                if float(operands[-1]) != 0.0:
                    mark_eol()
            elif op == "T*":
                mark_eol()
            elif op == "Tj" and operands:
                emit(_to_text(operands[-1]))
            elif op == "'" and operands:
                mark_eol()
                emit(_to_text(operands[-1]))
            elif op == '"' and operands:
                mark_eol()
                emit(_to_text(operands[-1]))
            elif op == "TJ" and operands and isinstance(operands[-1], list):
                text = "".join(
                    _to_text(part)
                    for part in operands[-1]
                    if isinstance(part, bytes)
                )
                emit(text)
            elif op == "ET":
                mark_eol()
            operands = []
        if items:
            items[-1]["hasEOL"] = True
        pages_out.append(items)
    return pages_out
