"""E19/E20 lang normalization + deterministic xid ids."""

from webscraper_ray.oracle.lang import is_rtl, lang639_3, lang_map_sql_values
from webscraper_ray.oracle.xid import make_xid, xid_from_str, xid_timestamp, xid_to_str


def test_lang_iso1():
    assert lang639_3("en") == "eng"
    assert lang639_3("zh") == "zho"
    assert lang639_3("fr") == "fra"


def test_lang_iso3_passthrough():
    assert lang639_3("deu") == "deu"


def test_lang_name_variants_case_insensitive():
    assert lang639_3("French") == "fra"
    assert lang639_3("français") == "fra"
    assert lang639_3("ESPAÑOL") == "spa"
    assert lang639_3("中文") == "zho"


def test_lang_unknown_empty():
    assert lang639_3("xx") == ""
    assert lang639_3("") == ""


def test_rtl():
    assert is_rtl("ara") and is_rtl("heb") and is_rtl("urd")
    assert not is_rtl("eng") and not is_rtl("")


def test_lang_sql_values_shape():
    sql = lang_map_sql_values()
    assert "('en', 'eng')" in sql and "('français', 'fra')" in sql


def test_xid_layout_and_sort():
    a = make_xid(1000, 0, "https://a/")
    b = make_xid(2000, 0, "https://a/")
    assert len(a) == 12 and len(b) == 12
    assert xid_timestamp(a) == 1000
    assert b > a  # byte order = time order -> max(id) is newest (A3 argmax)


def test_xid_deterministic():
    assert make_xid(5, 1, "https://u/") == make_xid(5, 1, "https://u/")
    assert make_xid(5, 1, "https://u/") != make_xid(5, 2, "https://u/")


def test_xid_string_roundtrip():
    x = make_xid(1700000000, 3, "https://example.com/p")
    s = xid_to_str(x)
    assert len(s) == 20 and set(s) <= set("0123456789abcdefghijklmnopqrstuv")
    assert xid_from_str(s) == x


def test_lang_table_complete_158():
    """E19: the full reference table (src/languages.json has 158 entries);
    spot-check entries the round-1 table was missing."""
    from webscraper_ray.oracle.lang import LANGUAGES

    assert len(LANGUAGES) == 158
    assert lang639_3("sw") == "swa"
    assert lang639_3("yo") == "yor"
    assert lang639_3("uz") == "uzb"
    assert lang639_3("ab") == "abk"
    assert lang639_3("Abkhazian") == "abk"
    assert lang639_3("bo") == "bod"  # Tibetan
    assert lang639_3("cu") == "chu"  # Church Slavonic


def test_lang_fixture_independent_and_consistent():
    """The DuckDB oracle derives from languages_fixture.json, not the
    table under test; both must carry the same 158 public facts."""
    import json
    import os

    import webscraper_ray.oracle as opkg
    from webscraper_ray.oracle.lang import LANGUAGES

    fixture = os.path.join(os.path.dirname(opkg.__file__), "languages_fixture.json")
    with open(fixture, encoding="utf-8") as f:
        obj = json.load(f)
    rows = [(iso1, v[0], v[1], v[2]) for iso1, v in obj.items()]
    assert len(rows) == 158
    assert rows == [tuple(r) for r in LANGUAGES]

    from webscraper_ray.queries import _fixture_lang_sql_values

    sql = _fixture_lang_sql_values()
    assert "('swa', 'swa')" in sql and "('abkhazian', 'abk')" in sql


def test_response_codec_gzip_threshold():
    """E18 (src/app.ts:120-154): CBOR/JSON encode + gzip only when the
    encoded body exceeds GZIP_MIN_LENGTH and the client accepts it."""
    import gzip as _gzip
    import json as _json

    from webscraper_ray.oracle.cbor import loads as cbor_loads
    from webscraper_ray.oracle.codec import (
        GZIP_MIN_LENGTH,
        decode_response,
        encode_response,
    )

    small = {"a": 1}
    data, ctype, enc = encode_response(small)
    assert ctype == "application/cbor" and enc is None
    assert cbor_loads(data) == small

    big = {"text": "x" * 300}
    data, ctype, enc = encode_response(big)
    assert enc == "gzip" and cbor_loads(decode_response(data, enc)) == big

    data, ctype, enc = encode_response(big, accept_cbor=False)
    assert ctype == "application/json" and enc == "gzip"
    assert _json.loads(decode_response(data, enc)) == big

    data, ctype, enc = encode_response(big, accept_gzip=False)
    assert enc is None

    s = "y" * (GZIP_MIN_LENGTH + 1)
    data, ctype, enc = encode_response(s)
    assert enc == "gzip" and decode_response(data, enc).decode() == s
    # deterministic gzip (mtime pinned)
    assert encode_response(big) == encode_response(big)

    # string threshold counts UTF-16 CODE UNITS like the reference's JS
    # body.length (src/app.ts), not encoded bytes: 100 CJK chars = 300
    # UTF-8 bytes but only 100 units -> NOT gzipped (ADVICE r2)
    cjk = "中" * 100
    data, ctype, enc = encode_response(cjk)
    assert enc is None and data.decode() == cjk
    # astral chars are surrogate PAIRS in JS: 65 of them = 130 units > 128
    astral = "\U0001f600" * 65
    data, ctype, enc = encode_response(astral)
    assert enc == "gzip" and decode_response(data, enc).decode() == astral


def test_encode_response_json_gzip_threshold_is_bytes():
    """The reference buffers the serialized JSON first
    (Buffer.from(JSON.stringify(body), 'utf8'), src/app.ts:128) and tests
    body.length on the BUFFER — UTF-8 bytes. Only the plain-string branch
    (src/app.ts:146) counts JS code units. 100 CJK chars serialize to
    ~309 bytes > 128 -> gzipped even though only ~109 code units."""
    from webscraper_ray.oracle.codec import decode_response, encode_response

    body = {"t": "文" * 100}  # JSON text ~109 code units, ~309 bytes
    data, ctype, enc = encode_response(body, accept_cbor=False)
    assert ctype == "application/json"
    assert enc == "gzip"  # byte length governs the object branch
    import json as _json

    assert _json.loads(decode_response(data, enc)) == body
    small = {"t": "文" * 30}  # ~97 bytes — under threshold either way
    _, _, enc2 = encode_response(small, accept_cbor=False)
    assert enc2 is None


# ---- charset sniffing (oracle/codec.sniff_decode) ----

def test_sniff_bom_beats_meta():
    from webscraper_ray.oracle.codec import sniff_decode

    # a BOM'd body whose CONTENT declares a different charset: BOM wins
    body = b"\xef\xbb\xbf" + b'<meta charset="windows-1252">hi'
    label, text = sniff_decode(body)
    assert label == "utf-8-bom" and text.endswith("hi")


def test_sniff_utf16_both_endians():
    from webscraper_ray.oracle.codec import sniff_decode

    assert sniff_decode("café".encode("utf-16")) == ("utf-16le", "café")
    assert sniff_decode(b"\xfe\xff" + "café".encode("utf-16-be")) == (
        "utf-16be",
        "café",
    )


def test_sniff_unknown_declared_charset_raises():
    import pytest

    from webscraper_ray.oracle.codec import sniff_decode

    with pytest.raises(ValueError, match="unknown declared"):
        sniff_decode(b'<meta charset="klingon-7">x')


def test_sniff_meta_only_scans_first_1024_bytes():
    from webscraper_ray.oracle.codec import sniff_decode

    late = b" " * 1100 + b'<meta charset="windows-1252">' + b"plain"
    label, _ = sniff_decode(late)
    assert label == "utf-8-default"


def test_sniff_undecodable_raises():
    import pytest

    from webscraper_ray.oracle.codec import sniff_decode

    with pytest.raises(UnicodeDecodeError):
        sniff_decode(b"\xff\x00\x00")  # utf-16le BOM then odd byte count? no:
        # \xff\xfe would be BOM; \xff\x00 is not a BOM -> utf-8 default, 0xff invalid
