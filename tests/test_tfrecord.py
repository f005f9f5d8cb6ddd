"""TFRecord container codec (`functions/tfrecord.py`): CRC-32C against
the published Castagnoli test vectors, mask round-trip, framing walk,
and the loud-failure contract on torn shards."""

import struct

import pytest

from webscraper_ray.functions.tfrecord import (
    _unmask,
    crc32c,
    masked_crc32c,
    read_tfrecords,
    write_tfrecords,
)


def test_crc32c_published_vectors():
    # RFC 3720 appendix / standard Castagnoli check values
    assert crc32c(b"") == 0
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"The quick brown fox jumps over the lazy dog") == 0x22620404
    assert crc32c(b"\x00" * 32) == 0x8A9136AA
    assert crc32c(b"\xff" * 32) == 0x62A8AB43


def test_crc32c_incremental_continuation():
    whole = crc32c(b"123456789")
    part = crc32c(b"6789", crc32c(b"12345"))
    assert part == whole


def test_mask_round_trips():
    for data in (b"", b"a", b"123456789", bytes(range(256))):
        assert _unmask(masked_crc32c(data)) == crc32c(data)


def test_roundtrip_preserves_order_and_bytes():
    recs = [b"hello", b"", b"\x00" * 1000, "unicode é中".encode()]
    assert read_tfrecords(write_tfrecords(recs)) == recs


def test_framing_layout_is_spec_exact():
    buf = write_tfrecords([b"abc"])
    (length,) = struct.unpack("<Q", buf[:8])
    assert length == 3
    assert buf[12:15] == b"abc"
    (len_crc,) = struct.unpack("<I", buf[8:12])
    (data_crc,) = struct.unpack("<I", buf[15:19])
    assert len_crc == masked_crc32c(buf[:8])
    assert data_crc == masked_crc32c(b"abc")
    assert len(buf) == 19


def test_payload_corruption_raises():
    buf = bytearray(write_tfrecords([b"hello world"]))
    buf[14] ^= 0x01
    with pytest.raises(ValueError, match="payload CRC"):
        read_tfrecords(bytes(buf))


def test_length_corruption_raises():
    buf = bytearray(write_tfrecords([b"hello world"]))
    buf[2] ^= 0x01
    with pytest.raises(ValueError, match="length CRC"):
        read_tfrecords(bytes(buf))


def test_truncation_raises():
    buf = write_tfrecords([b"hello", b"world"])
    with pytest.raises(ValueError, match="truncated"):
        read_tfrecords(buf[:-2])
    with pytest.raises(ValueError, match="truncated"):
        read_tfrecords(buf[: len(buf) - 19 + 5])


def test_verify_false_skips_crc_but_not_framing():
    buf = bytearray(write_tfrecords([b"hello"]))
    buf[13] ^= 0x01  # payload bit flip
    out = read_tfrecords(bytes(buf), verify=False)
    assert out == [b"hallo"] or out[0] != b"hello"
    with pytest.raises(ValueError):
        read_tfrecords(bytes(buf[:-1]), verify=False)
