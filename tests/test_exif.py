"""EXIF TIFF-IFD writer/parser — round-trips, endianness, spill-vs-
inline value storage, loud failure modes."""

import pytest
import struct

from webscraper_ray.functions.exif import build_exif, parse_exif


def _blob(i, be):
    return build_exif(
        make=f"CamCo {i}", model=f"M-{i}", orientation=i % 8 + 1,
        datetime_original="2025:06:07 08:09:10",
        pixel_x=640 + i, pixel_y=480 + i, big_endian=be,
    )


@pytest.mark.parametrize("be", [False, True])
def test_roundtrip(be):
    meta = parse_exif(_blob(5, be))
    assert meta == {
        "big_endian": be, "make": "CamCo 5", "model": "M-5",
        "orientation": 6, "datetime_original": "2025:06:07 08:09:10",
        "pixel_x": 645, "pixel_y": 485,
    }


def test_inline_vs_spilled_ascii():
    # "abc" (4 bytes with NUL) is inline; a longer make spills to the
    # data area — both must parse
    short = build_exif("abc", "xyz", 1, "2025:01:01 00:00:00", 1, 1)
    long = build_exif("a" * 40, "xyz", 1, "2025:01:01 00:00:00", 1, 1)
    assert parse_exif(short)["make"] == "abc"
    assert parse_exif(long)["make"] == "a" * 40


def test_bad_bom_raises():
    with pytest.raises(ValueError, match="byte-order"):
        parse_exif(b"XX" + b"\x00" * 10)


def test_bad_magic_raises():
    blob = bytearray(_blob(1, False))
    struct.pack_into("<H", blob, 2, 43)
    with pytest.raises(ValueError, match="magic"):
        parse_exif(bytes(blob))


def test_truncated_value_offset_raises():
    blob = _blob(1, False)
    with pytest.raises(ValueError, match="past end|truncated"):
        parse_exif(blob[:60])
