"""From-scratch PDF text extraction (C4 byte decode) — hand-crafted PDFs.

The extractor is original code against the public PDF spec; these
fixtures are built byte-by-byte in-test (raw and Flate-compressed
content streams, multi-page, object-stream variant, malformed input) and
the converter output is checked through the same heading heuristic the
reference applies to pdfjs items (src/converting.ts:43-145).
"""

import zlib

import pytest

from webscraper_ray.oracle.convert import convert_pdf, get_converter
from webscraper_ray.oracle.pdf import PdfError, extract_pdf_items


def _pdf(objects: dict[int, bytes], root: int) -> bytes:
    """Assemble a classic PDF: header + numbered objects + trailer."""
    out = bytearray(b"%PDF-1.4\n")
    offsets = {}
    for num in sorted(objects):
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num + objects[num] + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (max(objects) + 1)
    out += b"0000000000 65535 f \n"
    for num in sorted(objects):
        out += b"%010d 00000 n \n" % offsets[num]
    out += (
        b"trailer\n<< /Size %d /Root %d 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (max(objects) + 1, root, xref_at)
    )
    return bytes(out)


def _content() -> bytes:
    # one 24pt heading line, two 10pt body lines
    return (
        b"BT /F1 24 Tf 72 720 Td (Title Line) Tj ET\n"
        b"BT /F1 10 Tf 72 680 Td (First body line.) Tj 0 -14 Td"
        b" (Second body line.) Tj ET\n"
    )


def _one_page_pdf(compress: bool) -> bytes:
    content = _content()
    if compress:
        data = zlib.compress(content)
        stream = (
            b"<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(data)
            + data
            + b"\nendstream"
        )
    else:
        stream = b"<< /Length %d >>\nstream\n" % len(content) + content + b"\nendstream"
    return _pdf(
        {
            1: b"<< /Type /Catalog /Pages 2 0 R >>",
            2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
            3: b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
            4: stream,
            5: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        },
        root=1,
    )


@pytest.mark.parametrize("compress", [False, True])
def test_extract_items_heights_and_eol(compress):
    pages = extract_pdf_items(_one_page_pdf(compress))
    assert len(pages) == 1
    items = pages[0]
    texts = [i["str"] for i in items]
    assert texts == ["Title Line", "First body line.", "Second body line."]
    assert items[0]["height"] == 24.0
    assert items[1]["height"] == 10.0
    # line-advance marks the previous item; last item closed by ET
    assert [i["hasEOL"] for i in items] == [True, True, True]


def test_convert_pdf_heading_structure():
    doc = convert_pdf(_one_page_pdf(True), seed="t")
    kinds = [(n["type"], n.get("attrs", {}).get("level")) for n in doc["content"]]
    assert kinds[0] == ("heading", 1)
    assert all(k[0] == "paragraph" for k in kinds[1:])
    heading_text = doc["content"][0]["content"][0]["text"]
    assert heading_text == "Title Line"


def test_multi_page_and_tj_array():
    content2 = b"BT /F1 12 Tf (A) Tj ET\nBT /F1 12 Tf [(B) -120 (C)] TJ ET\n"
    pdf = _pdf(
        {
            1: b"<< /Type /Catalog /Pages 2 0 R >>",
            2: b"<< /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 >>",
            3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
            4: b"<< /Length %d >>\nstream\n" % len(_content())
            + _content()
            + b"\nendstream",
            5: b"<< /Type /Page /Parent 2 0 R /Contents 6 0 R >>",
            6: b"<< /Length %d >>\nstream\n" % len(content2)
            + content2
            + b"\nendstream",
        },
        root=1,
    )
    pages = extract_pdf_items(pdf)
    assert len(pages) == 2
    assert [i["str"] for i in pages[1]] == ["A", "BC"]


def test_object_stream_objects_are_found():
    # catalog+pages+page dicts live inside a /ObjStm (PDF 1.5 style)
    bodies = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
        (3, b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"),
    ]
    inner = b" ".join(b for _n, b in bodies)
    offs, pos = [], 0
    for _n, b in bodies:
        offs.append(pos)
        pos += len(b) + 1
    header = b"".join(
        b"%d %d " % (n, off) for (n, _b), off in zip(bodies, offs)
    )
    payload = header + inner
    data = zlib.compress(payload)
    content = b"BT /F1 9 Tf (objstm text) Tj ET"
    pdf = _pdf(
        {
            4: b"<< /Length %d >>\nstream\n" % len(content) + content + b"\nendstream",
            7: b"<< /Type /ObjStm /N 3 /First %d /Length %d /Filter /FlateDecode >>\nstream\n"
            % (len(header), len(data))
            + data
            + b"\nendstream",
        },
        root=1,
    )
    pages = extract_pdf_items(pdf)
    assert [i["str"] for i in pages[0]] == ["objstm text"]


def test_malformed_pdf_rejected():
    with pytest.raises(ValueError):
        extract_pdf_items(b"not a pdf at all")
    with pytest.raises(ValueError):
        extract_pdf_items(b"%PDF-1.4\ngarbage without catalog")


def test_converter_registry_routes_pdf():
    conv = get_converter("application/pdf")
    doc = conv(_one_page_pdf(False), seed="reg")
    assert doc["type"] == "doc" and doc["content"]


def test_pdf_fuzz_never_raises_unexpected():
    """Any byte garbage must either parse or raise PdfError (a ValueError
    the converter maps to its error channel) — never another exception."""
    import random

    rng = random.Random(1234)
    seeds = [
        b"",
        b"%PDF-",
        b"%PDF-1.4\n1 0 obj\n<< /Type /Catalog >>\nendobj\n",
        _one_page_pdf(False),
        _one_page_pdf(True),
    ]
    for trial in range(200):
        base = bytearray(seeds[trial % len(seeds)])
        for _ in range(rng.randint(0, 12)):
            if base:
                pos = rng.randrange(len(base))
                op = rng.random()
                if op < 0.4:
                    base[pos] = rng.randrange(256)
                elif op < 0.7:
                    del base[pos]
                else:
                    base.insert(pos, rng.randrange(256))
            else:
                base.extend(b"%PDF-")
        try:
            extract_pdf_items(bytes(base))
        except PdfError:
            pass
        except RecursionError as exc:  # would be a real bug
            raise AssertionError("recursion blowup") from exc


def test_stream_with_endobj_bytes_and_direct_length():
    """A stream body containing the literal bytes 'endobj' must not be
    truncated when the dict carries a direct /Length (ADVICE r2: the
    object-end scan false-matched inside stream data)."""
    content = (
        b"BT /F1 10 Tf 72 720 Td (before endobj after) Tj ET\n"
    )
    assert b"endobj" in content
    stream = b"<< /Length %d >>\nstream\n" % len(content) + content + b"\nendstream"
    pdf = _pdf(
        {
            1: b"<< /Type /Catalog /Pages 2 0 R >>",
            2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
            3: b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents 4 0 R >>",
            4: stream,
        },
        root=1,
    )
    pages = extract_pdf_items(pdf)
    assert [i["str"] for i in pages[0]] == ["before endobj after"]


def test_flate_stream_with_endobj_bytes():
    """Same guarantee for compressed streams: craft Flate output that
    contains the literal 'endobj' via an uncompressed deflate block."""
    content = b"BT /F1 10 Tf 72 720 Td (hello world) Tj ET\n"
    co = zlib.compressobj(0)  # level 0: stored blocks, bytes pass through
    data = co.compress(content + b"% endobj padding\n") + co.flush()
    assert b"endobj" in data
    stream = (
        b"<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(data)
        + data
        + b"\nendstream"
    )
    pdf = _pdf(
        {
            1: b"<< /Type /Catalog /Pages 2 0 R >>",
            2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
            3: b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents 4 0 R >>",
            4: stream,
        },
        root=1,
    )
    pages = extract_pdf_items(pdf)
    assert [i["str"] for i in pages[0]] == ["hello world"]


def test_encrypt_in_string_content_not_rejected():
    """'/Encrypt' appearing in page TEXT must not trip the encryption
    check (ADVICE r2: it is now restricted to the trailer / XRef dict)."""
    content = b"BT /F1 10 Tf 72 720 Td (see /Encrypt docs) Tj ET\n"
    stream = b"<< /Length %d >>\nstream\n" % len(content) + content + b"\nendstream"
    pdf = _pdf(
        {
            1: b"<< /Type /Catalog /Pages 2 0 R >>",
            2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
            3: b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents 4 0 R >>",
            4: stream,
        },
        root=1,
    )
    pages = extract_pdf_items(pdf)
    assert [i["str"] for i in pages[0]] == ["see /Encrypt docs"]


def test_encrypted_trailer_rejected():
    pdf = _one_page_pdf(False).replace(
        b"trailer\n<< /Size", b"trailer\n<< /Encrypt 9 0 R /Size"
    )
    with pytest.raises(PdfError):
        extract_pdf_items(pdf)


def _cid_pdf(with_tounicode: bool = True) -> bytes:
    """Type0 / Identity-H font whose 2-byte CIDs map through a ToUnicode
    CMap (bfchar + both bfrange forms), like pdfjs handles subset fonts
    (reference path: src/converting.ts:43-145)."""
    # CIDs: 1->H 2->e(acute) 3..5 -> l,m,n (incrementing bfrange),
    # 6..7 -> "ff","fi" ligature strings (array bfrange)
    cmap = (
        b"/CIDInit /ProcSet findresource begin\n"
        b"begincmap\n"
        b"1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
        b"2 beginbfchar\n"
        b"<0001> <0048>\n"          # H
        b"<0002> <00E9>\n"          # e-acute
        b"endbfchar\n"
        b"2 beginbfrange\n"
        b"<0003> <0005> <006C>\n"   # l, m, n
        b"<0006> <0007> [<00660066> <00660069>]\n"  # ff, fi
        b"endbfrange\n"
        b"endcmap\nend\n"
    )
    content = b"BT /F1 12 Tf 72 720 Td <000100020003000400050006 0007> Tj ET\n"
    return _pdf(
        {
            1: b"<< /Type /Catalog /Pages 2 0 R >>",
            2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
            3: b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
            4: b"<< /Length %d >>\nstream\n" % len(content) + content + b"\nendstream",
            5: (
                b"<< /Type /Font /Subtype /Type0 /BaseFont /Fake-Identity-H "
                b"/Encoding /Identity-H"
                + (b" /ToUnicode 6 0 R" if with_tounicode else b"")
                + b" >>"
            ),
            6: b"<< /Length %d >>\nstream\n" % len(cmap) + cmap + b"\nendstream",
        },
        root=1,
    )


def test_cid_font_tounicode_text():
    pages = extract_pdf_items(_cid_pdf())
    assert [i["str"] for i in pages[0]] == ["Hélmnfffi"]


def test_cid_font_without_tounicode_falls_back_to_codepoints():
    pages = extract_pdf_items(_cid_pdf(with_tounicode=False))
    # 2-byte Identity codes decode as chr(code) - raw but lossless
    assert [i["str"] for i in pages[0]] == [
        "\x01\x02\x03\x04\x05\x06\x07"
    ]


def test_simple_font_tounicode_overrides_latin1():
    """A 1-byte simple font's ToUnicode remaps individual byte codes."""
    cmap = (
        b"1 begincodespacerange\n<00> <FF>\nendcodespacerange\n"
        b"1 beginbfchar\n<41> <039B>\nendbfchar\n"  # 'A' -> Greek Lambda
    )
    content = b"BT /F1 10 Tf 72 720 Td (ABC) Tj ET\n"
    pdf = _pdf(
        {
            1: b"<< /Type /Catalog /Pages 2 0 R >>",
            2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
            3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
            b"/Resources << /Font << /F1 5 0 R >> >> >>",
            4: b"<< /Length %d >>\nstream\n" % len(content) + content + b"\nendstream",
            5: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
            b"/ToUnicode 6 0 R >>",
            6: b"<< /Length %d >>\nstream\n" % len(cmap) + cmap + b"\nendstream",
        },
        root=1,
    )
    pages = extract_pdf_items(pdf)
    assert [i["str"] for i in pages[0]] == ["ΛBC"]


def test_cid_font_through_converter():
    """End-to-end: the CID fixture converts to a tree whose text is the
    mapped unicode (C4 through the C1 registry)."""
    doc = convert_pdf(_cid_pdf(), seed="cid")
    texts = [
        span["text"]
        for node in doc["content"]
        for span in node.get("content", [])
        if span.get("type") == "text"
    ]
    assert "".join(texts) == "Hélmnfffi"


# --- non-Flate filters (ISO 32000-1 §7.4.2/4/5) ------------------------------


def _lzw_encode(data: bytes, early: int = 1) -> bytes:
    """Minimal LZW encoder mirroring the decoder's width-growth rule."""
    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    codes = [256]  # leading CLEAR
    w = b""
    for b in bytes(data):
        wc = w + bytes([b])
        if wc in table:
            w = wc
        else:
            codes.append(table[w])
            if next_code < 4096:
                table[wc] = next_code
                next_code += 1
            w = bytes([b])
    if w:
        codes.append(table[w])
    codes.append(257)  # EOD
    out = bytearray()
    buf = 0
    nbits = 0
    # replay the decoder's width schedule: width grows AFTER the decoder
    # has added its (n-1)th entry, i.e. track next_code as the decoder
    # sees it (one behind the encoder within a phrase)
    dec_next = 258
    dec_width = 9
    prev_emitted = False
    for code in codes:
        buf = (buf << dec_width) | code
        nbits += dec_width
        while nbits >= 8:
            out.append((buf >> (nbits - 8)) & 0xFF)
            nbits -= 8
        if code == 256:
            dec_next, dec_width, prev_emitted = 258, 9, False
            continue
        if code == 257:
            break
        if prev_emitted and dec_next < 4096:
            dec_next += 1
        prev_emitted = True
        if dec_width < 12 and dec_next + early >= (1 << dec_width):
            dec_width += 1
    if nbits:
        out.append((buf << (8 - nbits)) & 0xFF)
    return bytes(out)


def test_filter_decoders_roundtrip():
    from webscraper_ray.oracle.pdf import (
        _ascii_hex_decode,
        _lzw_decode,
        _run_length_decode,
    )

    payload = b"BT (abc) Tj ET " * 40 + b"\x00\xff tail"
    assert _ascii_hex_decode(payload.hex().encode() + b">") == payload
    assert _ascii_hex_decode(b"41 42\n4") == b"AB@"  # odd digit pads 0
    # RunLength: 2 literals, then 'x' * 4, then EOD
    assert _run_length_decode(bytes([1]) + b"ab" + bytes([253]) + b"x" + bytes([128])) == b"abxxxx"
    assert _lzw_decode(_lzw_encode(payload)) == payload
    assert _lzw_decode(_lzw_encode(payload, early=0), early=0) == payload


@pytest.mark.parametrize(
    "filt",
    ["ASCIIHexDecode", "RunLengthDecode", "LZWDecode"],
)
def test_non_flate_filtered_page_extracts(filt):
    from webscraper_ray.oracle.pdf import extract_pdf_items

    content = _content()
    if filt == "ASCIIHexDecode":
        data = content.hex().encode() + b">"
    elif filt == "RunLengthDecode":
        data = b""
        for i in range(0, len(content), 100):
            chunk = content[i : i + 100]
            data += bytes([len(chunk) - 1]) + chunk
        data += bytes([128])
    else:
        data = _lzw_encode(content)
    stream = (
        b"<< /Length %d /Filter /%s >>\nstream\n" % (len(data), filt.encode())
        + data
        + b"\nendstream"
    )
    buf = _pdf(
        {
            1: b"<< /Type /Catalog /Pages 2 0 R >>",
            2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
            3: b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
            4: stream,
            5: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        },
        root=1,
    )
    items = extract_pdf_items(buf)
    texts = [i["str"] for i in items[0]]
    assert "Title Line" in texts and "Second body line." in texts


def test_lzw_roundtrip_across_width_switches():
    """High-entropy payload builds >1024 dictionary entries, crossing the
    9->10->11 bit switches under both EarlyChange conventions (spec:
    early=1 switches when entry 511 is added)."""
    import random

    from webscraper_ray.oracle.pdf import _lzw_decode

    rng = random.Random(5)
    payload = bytes(rng.randrange(256) for _ in range(8000))
    for early in (1, 0):
        assert _lzw_decode(_lzw_encode(payload, early=early), early=early) == payload


def test_decodeparms_array_shorter_than_filters():
    """A /DecodeParms array shorter than /Filter (malformed but seen in
    the wild) must not silently drop trailing filters — missing entries
    mean 'no parms'."""
    import zlib

    from webscraper_ray.oracle.pdf import extract_pdf_items

    content = _content()
    data = zlib.compress(content).hex().encode() + b">"
    stream = (
        b"<< /Length %d /Filter [/ASCIIHexDecode /FlateDecode] "
        b"/DecodeParms [null] >>\nstream\n" % len(data)
        + data
        + b"\nendstream"
    )
    buf = _pdf(
        {
            1: b"<< /Type /Catalog /Pages 2 0 R >>",
            2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
            3: b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
            4: stream,
            5: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        },
        root=1,
    )
    items = extract_pdf_items(buf)
    texts = [i["str"] for i in items[0]]
    assert "Title Line" in texts and "Second body line." in texts


def test_dct_image_xobject_passthrough():
    """VERDICT r3 #7: a DCT-filtered (JPEG) image XObject must not break
    text extraction — text ops never need the image bytes. The fake JPEG
    body deliberately contains PDF-looking byte traps ('7 0 obj',
    'endstream', unbalanced parens)."""
    # realistic-ish JPEG: SOI/APP0 header + binary junk incl. trap bytes
    jpeg = (
        b"\xff\xd8\xff\xe0\x00\x10JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
        + b"\x00( 7 0 obj endstream \xff\xfe" + bytes(range(256)) + b"\xff\xd9"
    )
    content = (
        b"BT /F1 24 Tf 72 720 Td (Title Line) Tj ET\n"
        b"q 100 0 0 100 72 500 cm /Im0 Do Q\n"
        b"BT /F1 10 Tf 72 400 Td (Body after image.) Tj ET\n"
    )
    pdf = _pdf(
        {
            1: b"<< /Type /Catalog /Pages 2 0 R >>",
            2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
            3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R /Resources "
            b"<< /Font << /F1 5 0 R >> /XObject << /Im0 6 0 R >> >> >>",
            4: b"<< /Length %d >>\nstream\n" % len(content)
            + content
            + b"\nendstream",
            5: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
            6: b"<< /Type /XObject /Subtype /Image /Width 8 /Height 8 "
            b"/ColorSpace /DeviceRGB /BitsPerComponent 8 /Filter /DCTDecode "
            b"/Length %d >>\nstream\n" % len(jpeg)
            + jpeg
            + b"\nendstream",
        },
        root=1,
    )
    pages = extract_pdf_items(pdf)
    assert [i["str"] for i in pages[0]] == ["Title Line", "Body after image."]
    # the converter path (paragraph_counts-style gating) works too
    doc = convert_pdf(pdf, seed="t")
    texts = [n["content"][0]["text"] for n in doc["content"]]
    assert texts == ["Title Line", "Body after image."]


def test_inline_image_binary_skipped():
    """BI/ID/EI inline image: raw binary (with '(' and 'Tj' traps) must
    be skipped to EI, leaving surrounding text intact."""
    binary = b"\xff\xd8( Tj ET BT \x00\x01EIX" + bytes(range(64)) + b"\xff"
    content = (
        b"BT /F1 12 Tf (Before) Tj ET\n"
        b"BI /W 4 /H 4 /BPC 8 /CS /RGB /F /DCT ID " + binary + b" EI\n"
        b"BT /F1 12 Tf (After) Tj ET\n"
    )
    pdf = _pdf(
        {
            1: b"<< /Type /Catalog /Pages 2 0 R >>",
            2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
            3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R /Resources "
            b"<< /Font << /F1 5 0 R >> >> >>",
            4: b"<< /Length %d >>\nstream\n" % len(content)
            + content
            + b"\nendstream",
            5: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        },
        root=1,
    )
    pages = extract_pdf_items(pdf)
    assert [i["str"] for i in pages[0]] == ["Before", "After"]


def test_explicit_dct_stream_decode_still_raises():
    """Decoding a DCT stream on purpose (not via text extraction) keeps
    the honest unsupported-filter error."""
    from webscraper_ray.oracle.pdf import _Pdf

    jpeg = b"\xff\xd8\xff\xd9"
    pdf_bytes = _pdf(
        {
            1: b"<< /Type /Catalog /Pages 2 0 R >>",
            2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
            3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
            4: b"<< /Length 5 >>\nstream\nBT ET\nendstream",
            5: b"<< /Subtype /Image /Filter /DCTDecode /Length %d >>\nstream\n"
            % len(jpeg)
            + jpeg
            + b"\nendstream",
        },
        root=1,
    )
    p = _Pdf(pdf_bytes)
    with pytest.raises(PdfError, match="unsupported stream filter"):
        p.stream_data(p.objects[5])


# ---------------------------------------------------------------------------
# Standard security handler (RC4) — encryptor written independently in-test
# (hashlib + its own RC4 loop) against PDF 1.7 §7.6.3, so the module's key
# derivation is checked by round-trip, not by reusing its own helpers.

_ENC_PAD = bytes.fromhex(
    "28bf4e5e4e758a416400"
    "4e56fffa01082e2e00b6"
    "d0683e802f0ca9fe6453"
    "697a"
)
_ID0 = bytes(range(16))


def _rc4_test(key: bytes, data: bytes) -> bytes:
    s = bytearray(range(256))
    j = 0
    for i in range(256):
        j = (j + s[i] + key[i % len(key)]) % 256
        s[i], s[j] = s[j], s[i]
    i = j = 0
    out = bytearray()
    for c in data:
        i = (i + 1) % 256
        j = (j + s[i]) % 256
        s[i], s[j] = s[j], s[i]
        out.append(c ^ s[(s[i] + s[j]) % 256])
    return bytes(out)


def _enc_params(r: int, n: int, user_pw: bytes = b"", em: bool = True):
    import hashlib

    owner = (b"" + _ENC_PAD)[:32]  # empty owner password
    if r == 2:
        ok = hashlib.md5(owner).digest()[:n]
    else:
        h = hashlib.md5(owner).digest()
        for _ in range(50):
            h = hashlib.md5(h[:n]).digest()
        ok = h[:n]
    o = (user_pw + _ENC_PAD)[:32]
    if r == 2:
        o = _rc4_test(ok, o)
    else:
        for i in range(20):
            o = _rc4_test(bytes(b ^ i for b in ok), o)
    p = -44  # permissions int32
    h = hashlib.md5(
        (user_pw + _ENC_PAD)[:32]
        + o
        + (p & 0xFFFFFFFF).to_bytes(4, "little")
        + _ID0
        + (b"\xff\xff\xff\xff" if r >= 4 and not em else b"")
    ).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h[:n]).digest()
    key = h[:n]
    if r == 2:
        u = _rc4_test(key, _ENC_PAD)
    else:
        u = _rc4_test(key, hashlib.md5(_ENC_PAD + _ID0).digest())
        for i in range(1, 20):
            u = _rc4_test(bytes(b ^ i for b in key), u)
        u = u + b"\x00" * 16
    return key, o, u, p


def _obj_key_test(key: bytes, num: int) -> bytes:
    import hashlib

    h = hashlib.md5(
        key + (num).to_bytes(3, "little") + (0).to_bytes(2, "little")
    ).digest()
    return h[: min(len(key) + 5, 16)]


def _encrypted_pdf(r: int, v: int, bits: int, user_pw: bytes = b"") -> bytes:
    import zlib as _z

    n = bits // 8
    key, o, u, p = _enc_params(r, n, user_pw)
    data = _z.compress(_content())
    enc_data = _rc4_test(_obj_key_test(key, 4), data)
    stream = (
        b"<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(enc_data)
        + enc_data
        + b"\nendstream"
    )
    length_entry = b" /Length %d" % bits if v == 2 else b""
    objects = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        4: stream,
        5: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        6: b"<< /Filter /Standard /V %d /R %d%s /O <%s> /U <%s> /P %d >>"
        % (v, r, length_entry, o.hex().encode(), u.hex().encode(), p),
    }
    pdf = _pdf(objects, root=1)
    return pdf.replace(
        b"trailer\n<< /Size",
        b"trailer\n<< /Encrypt 6 0 R /ID [<%s> <%s>] /Size"
        % (_ID0.hex().encode(), _ID0.hex().encode()),
    )


@pytest.mark.parametrize("r,v,bits", [(2, 1, 40), (3, 2, 128)])
def test_encrypted_rc4_roundtrip(r, v, bits):
    pages = extract_pdf_items(_encrypted_pdf(r, v, bits))
    assert [i["str"] for i in pages[0]] == [
        "Title Line",
        "First body line.",
        "Second body line.",
    ]


def test_password_protected_rejected():
    with pytest.raises(PdfError, match="password-protected"):
        extract_pdf_items(_encrypted_pdf(3, 2, 128, user_pw=b"secret"))


# V4/R4 crypt filters (AESV2 = AES-128-CBC). The block cipher itself is
# pinned below to the published FIPS-197 / NIST SP 800-38A known-answer
# vectors; the fixture builder derives keys, the sAlT object-key salt,
# the IV+CBC layering and the RFC 2898 padding INDEPENDENTLY (hashlib +
# its own CBC loop over the KAT-pinned block primitive), so the module's
# V4 path is checked by round-trip like the RC4 fixtures.


def test_aes128_fips197_kat():
    from webscraper_ray.oracle.pdf import (
        _aes128_decrypt_block,
        _aes128_encrypt_block,
        _aes128_round_keys,
    )

    # FIPS-197 Appendix C.1
    rk = _aes128_round_keys(bytes.fromhex("000102030405060708090a0b0c0d0e0f"))
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    ct = bytes.fromhex("69c4e0d86a7b0430d8cdb78070b4c55a")
    assert _aes128_encrypt_block(rk, pt) == ct
    assert _aes128_decrypt_block(rk, ct) == pt
    # NIST SP 800-38A F.2.1 (CBC-AES128.Encrypt), all four blocks
    rk = _aes128_round_keys(bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c"))
    iv = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    pts = [
        "6bc1bee22e409f96e93d7e117393172a",
        "ae2d8a571e03ac9c9eb76fac45af8e51",
        "30c81c46a35ce411e5fbc1191a0a52ef",
        "f69f2445df4f9b17ad2b417be66c3710",
    ]
    cts = [
        "7649abac8119b246cee98e9b12e9197d",
        "5086cb9b507219ee95db113a917678b2",
        "73bed6b8e3c1743b7116e69e22229516",
        "3ff1caa1681fac09120eca307586e1a7",
    ]
    prev = iv
    for p_hex, c_hex in zip(pts, cts):
        c = _aes128_encrypt_block(
            rk, bytes(a ^ b for a, b in zip(bytes.fromhex(p_hex), prev))
        )
        assert c == bytes.fromhex(c_hex)
        prev = c


def _aes_cbc_encrypt_test(key: bytes, iv: bytes, data: bytes) -> bytes:
    """Test-side CBC encryptor + RFC 2898 padder over the KAT-pinned
    block primitive; returns IV || ciphertext as the AESV2 stream
    layout requires."""
    from webscraper_ray.oracle.pdf import _aes128_encrypt_block, _aes128_round_keys

    rk = _aes128_round_keys(key)
    pad = 16 - len(data) % 16
    data = data + bytes([pad]) * pad
    out, prev = bytearray(iv), iv
    for off in range(0, len(data), 16):
        prev = _aes128_encrypt_block(
            rk, bytes(a ^ b for a, b in zip(data[off : off + 16], prev))
        )
        out += prev
    return bytes(out)


def _v4_encrypted_pdf(cfm: bytes = b"AESV2", em: bool = True) -> bytes:
    import hashlib
    import zlib as _z

    key, o, u, p = _enc_params(4, 16, em=em)
    data = _z.compress(_content())
    if cfm == b"AESV2":
        ok = hashlib.md5(
            key + (4).to_bytes(3, "little") + (0).to_bytes(2, "little") + b"sAlT"
        ).digest()[:16]
        enc_data = _aes_cbc_encrypt_test(ok, bytes(range(16)), data)
    elif cfm == b"V2":
        enc_data = _rc4_test(_obj_key_test(key, 4), data)
    else:  # Identity / rejected methods: stream stays plaintext
        enc_data = data
    stream = (
        b"<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(enc_data)
        + enc_data
        + b"\nendstream"
    )
    em_entry = b"" if em else b" /EncryptMetadata false"
    stmf = b"Identity" if cfm == b"Identity" else b"StdCF"
    objects = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        4: stream,
        5: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        6: b"<< /Filter /Standard /V 4 /R 4 /Length 128%s "
        b"/CF << /StdCF << /CFM /%s /Length 16 >> >> /StmF /%s /StrF /%s "
        b"/O <%s> /U <%s> /P %d >>"
        % (em_entry, cfm, stmf, stmf, o.hex().encode(), u.hex().encode(), p),
    }
    pdf = _pdf(objects, root=1)
    return pdf.replace(
        b"trailer\n<< /Size",
        b"trailer\n<< /Encrypt 6 0 R /ID [<%s> <%s>] /Size"
        % (_ID0.hex().encode(), _ID0.hex().encode()),
    )


@pytest.mark.parametrize("cfm", [b"AESV2", b"V2", b"Identity"])
def test_encrypted_v4_roundtrip(cfm):
    pages = extract_pdf_items(_v4_encrypted_pdf(cfm))
    assert [i["str"] for i in pages[0]] == [
        "Title Line",
        "First body line.",
        "Second body line.",
    ]


def test_encrypted_aesv2_encrypt_metadata_false():
    """R4 with /EncryptMetadata false changes Algorithm 2 (ffffffff
    appended); both sides must apply it or the U check fails."""
    pages = extract_pdf_items(_v4_encrypted_pdf(b"AESV2", em=False))
    assert pages[0][0]["str"] == "Title Line"


def test_aes_wrong_key_padding_is_loud():
    """A corrupt final block must raise (bad padding), never emit
    silently truncated garbage text."""
    pdf = _v4_encrypted_pdf(b"AESV2")
    i = pdf.find(b"stream\n") + len(b"stream\n")
    j = pdf.find(b"\nendstream", i)
    corrupted = pdf[: j - 1] + bytes([pdf[j - 1] ^ 0xFF]) + pdf[j:]
    with pytest.raises(PdfError, match="padding"):
        extract_pdf_items(corrupted)


def test_aes256_v5_rejected():
    pdf = _encrypted_pdf(3, 2, 128).replace(b"/V 2 /R 3", b"/V 5 /R 6")
    with pytest.raises(PdfError, match="subset"):
        extract_pdf_items(pdf)


def test_aesv3_crypt_filter_rejected():
    pdf = _v4_encrypted_pdf(b"AESV2").replace(b"/CFM /AESV2", b"/CFM /AESV3")
    with pytest.raises(PdfError, match="AESV3"):
        extract_pdf_items(pdf)


def test_non_stdcf_stream_filter_rejected():
    pdf = _v4_encrypted_pdf(b"AESV2").replace(b"/StmF /StdCF", b"/StmF /MyCF")
    with pytest.raises(PdfError, match="MyCF"):
        extract_pdf_items(pdf)


def test_embedded_cmap_encoding_maps_code_to_cid():
    """Type0 font with an EMBEDDED CMap /Encoding and no ToUnicode:
    codes map through cidchar/cidrange to CIDs; fallback text is
    chr(CID), not chr(code)."""
    cmap = (
        b"/CIDInit /ProcSet findresource begin\n"
        b"1 begincodespacerange <0000> <FFFF> endcodespacerange\n"
        b"3 begincidchar\n<0001> 72\n<0002> 105\n<0003> 33\nendcidchar\n"
        b"1 begincidrange\n<0010> <0012> 65\nendcidrange\n"
        b"endcmap end\n"
    )
    content = b"BT /F1 12 Tf 72 700 Td <000100020003> Tj <001000110012> Tj ET\n"
    pdf = _pdf(
        {
            1: b"<< /Type /Catalog /Pages 2 0 R >>",
            2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
            3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
            b"/Resources << /Font << /F1 5 0 R >> >> >>",
            4: b"<< /Length %d >>\nstream\n" % len(content) + content + b"\nendstream",
            5: b"<< /Type /Font /Subtype /Type0 /BaseFont /X /Encoding 7 0 R >>",
            7: b"<< /Length %d >>\nstream\n" % len(cmap) + cmap + b"\nendstream",
        },
        root=1,
    )
    pages = extract_pdf_items(pdf)
    assert [i["str"] for i in pages[0]] == ["Hi!", "ABC"]


def _predicted_stream(content: bytes, pred: int, columns: int) -> bytes:
    """Apply the PNG Up filter (pred 12 layout) or TIFF differencing
    (pred 2) the way an encoder would, then Flate-compress."""
    import zlib as _z

    rows = [content[i : i + columns] for i in range(0, len(content), columns)]
    rows = [r + b"\x00" * (columns - len(r)) for r in rows]  # pad last row
    if pred == 2:
        enc = bytearray()
        for r in rows:
            row = bytearray(r)
            for i in range(len(row) - 1, 0, -1):
                row[i] = (row[i] - row[i - 1]) & 0xFF
            enc += row
    else:  # PNG Up
        enc = bytearray()
        prev = bytes(columns)
        for r in rows:
            enc.append(2)
            enc += bytes((c - p) & 0xFF for c, p in zip(r, prev))
            prev = r
    return _z.compress(bytes(enc))


@pytest.mark.parametrize("pred", [2, 12])
def test_flate_predictor_roundtrip(pred):
    content = _content()
    cols = 40
    padded_len = ((len(content) + cols - 1) // cols) * cols
    data = _predicted_stream(content, pred, cols)
    stream = (
        b"<< /Length %d /Filter /FlateDecode /DecodeParms "
        b"<< /Predictor %d /Columns %d >> >>\nstream\n" % (len(data), pred, cols)
        + data
        + b"\nendstream"
    )
    pdf = _pdf(
        {
            1: b"<< /Type /Catalog /Pages 2 0 R >>",
            2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
            3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
            b"/Resources << /Font << /F1 5 0 R >> >> >>",
            4: stream,
            5: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        },
        root=1,
    )
    assert padded_len >= len(content)
    pages = extract_pdf_items(pdf)
    assert [i["str"] for i in pages[0]] == [
        "Title Line",
        "First body line.",
        "Second body line.",
    ]


def test_pdf_fuzz_new_paths_never_raise_unexpected():
    """Fuzz over the round-4 paths too (RC4-encrypted file, predictor
    stream): mutated bytes must parse or raise PdfError, never leak
    KeyError/struct.error/IndexError out of decrypt/unpredict."""
    import random

    rng = random.Random(4321)
    content = _content()
    data = _predicted_stream(content, 12, 40)
    pred_pdf = _pdf(
        {
            1: b"<< /Type /Catalog /Pages 2 0 R >>",
            2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
            3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
            4: b"<< /Length %d /Filter /FlateDecode /DecodeParms "
            b"<< /Predictor 12 /Columns 40 >> >>\nstream\n" % len(data)
            + data
            + b"\nendstream",
        },
        root=1,
    )
    seeds = [_encrypted_pdf(2, 1, 40), _encrypted_pdf(3, 2, 128), pred_pdf]
    for trial in range(150):
        base = bytearray(seeds[trial % len(seeds)])
        for _ in range(rng.randint(1, 12)):
            pos = rng.randrange(len(base))
            op = rng.random()
            if op < 0.4:
                base[pos] = rng.randrange(256)
            elif op < 0.7:
                del base[pos]
            else:
                base.insert(pos, rng.randrange(256))
        try:
            extract_pdf_items(bytes(base))
        except PdfError:
            pass
