"""WARC record grammar: declared-length walk (payloads containing
blank lines must parse exactly), multi-record files, and loud raises on
truncation / bad version / missing Content-Length."""

from __future__ import annotations

import pytest

from webscraper_ray.functions.warc import parse_warc, write_warc_record


def test_roundtrip_single():
    rec = write_warc_record(
        "https://a.example/doc/1", b"hello world", record_id="urn:doc:1"
    )
    [r] = parse_warc(rec)
    assert r["target_uri"] == "https://a.example/doc/1"
    assert r["record_id"] == "urn:doc:1"
    assert r["warc_type"] == "response"
    assert r["payload"] == b"hello world"


def test_payload_with_blank_lines_honors_content_length():
    """The killer case for blank-line-split parsers: \\r\\n\\r\\n INSIDE
    the payload. The declared-length walk must return it intact."""
    body = b"HTTP/1.1 200 OK\r\nX: y\r\n\r\nline1\r\n\r\nline2\r\n\r\n"
    rec = write_warc_record("https://h/x", body, record_id="urn:doc:7")
    [r] = parse_warc(rec)
    assert r["payload"] == body


def test_multi_record_walk():
    blob = b"".join(
        write_warc_record(f"https://h/{i}", bytes([i]) * i, record_id=f"urn:doc:{i}")
        for i in range(1, 6)
    )
    recs = parse_warc(blob)
    assert [len(r["payload"]) for r in recs] == [1, 2, 3, 4, 5]
    assert [r["target_uri"] for r in recs] == [f"https://h/{i}" for i in range(1, 6)]


def test_warcinfo_record_without_uri():
    rec = write_warc_record(
        "https://h/x", b"k: v", record_id="urn:info:0", warc_type="warcinfo"
    )
    # strip the Target-URI line to model a warcinfo record
    stripped = rec.replace(b"WARC-Target-URI: https://h/x\r\n", b"")
    [r] = parse_warc(stripped)
    assert r["warc_type"] == "warcinfo"
    assert r["target_uri"] is None


def test_raises_on_corruption():
    rec = write_warc_record("https://h/x", b"abcdef", record_id="urn:doc:1")
    with pytest.raises(ValueError, match="truncated"):
        parse_warc(rec[:-6])  # cut into the payload/separator
    with pytest.raises(ValueError, match="version"):
        parse_warc(b"HTTP/1.1 200\r\n\r\n")
    no_len = rec.replace(b"Content-Length: 6\r\n", b"")
    # removing the final header line leaves the version + fields intact
    no_len2 = rec.replace(b"\r\nContent-Length: 6", b"")
    with pytest.raises(ValueError, match="Content-Length"):
        parse_warc(no_len2)
    assert no_len != rec  # both strip variants exercised
    bad_sep = rec[:-4] + b"XXXX"
    with pytest.raises(ValueError, match="separator|truncated"):
        parse_warc(bad_sep)


def test_gz_multi_member_roundtrip():
    from webscraper_ray.functions.warc import gzip_member, parse_warc_gz

    blob = b"".join(
        gzip_member(
            write_warc_record(f"https://h/{i}", b"x" * i, record_id=f"urn:doc:{i}")
        )
        for i in range(1, 4)
    )
    recs = parse_warc_gz(blob)
    assert [len(r["payload"]) for r in recs] == [1, 2, 3]
    # deterministic members: same input -> same bytes (mtime pinned)
    assert gzip_member(b"abc") == gzip_member(b"abc")


def test_gz_truncation_raises():
    from webscraper_ray.functions.warc import gzip_member, parse_warc_gz

    m = gzip_member(write_warc_record("https://h/1", b"hello", record_id="u:1"))
    with pytest.raises(ValueError, match="truncated|corrupt"):
        parse_warc_gz(m[:-3])
    with pytest.raises(ValueError, match="corrupt"):
        parse_warc_gz(m + b"NOTGZIP")
