"""BWT+MTF+RLE codec (functions/bwt.py): brute-force rotation-sort
equality, full-pipeline fuzz, stage-level edge cases, and the loud
failure contracts."""

import random

import pytest

from webscraper_ray.functions.bwt import (
    bwt_decode,
    bwt_encode,
    compress,
    decompress,
    mtf_decode,
    mtf_encode,
    rle0_decode,
    rle0_encode,
)


def _brute(data: bytes) -> bytes:
    s = data + b"\x00"
    rots = sorted(s[i:] + s[:i] for i in range(len(s)))
    return bytes(r[-1] for r in rots)


def test_bwt_matches_sorted_rotations():
    for s in (b"banana", b"mississippi", b"abcabc", b"aaaa", b"a", b""):
        assert bwt_encode(s) == _brute(s)
        assert bwt_decode(bwt_encode(s)) == s


def test_fuzz_full_pipeline():
    rng = random.Random(17)
    for _ in range(120):
        n = rng.randint(0, 200)
        data = bytes(rng.choices(range(1, 256), k=n))
        assert bwt_encode(data) == _brute(data)
        assert decompress(compress(data)) == data


def test_repetitive_text_compresses():
    data = b"the quick brown fox " * 100
    blob = compress(data)
    assert decompress(blob) == data
    assert len(blob) < len(data) // 5  # BWT+MTF+RLE must actually shrink


def test_mtf_and_rle_stages():
    data = bytes([5, 5, 5, 0, 0, 0, 0, 7])
    assert mtf_decode(mtf_encode(data)) == data
    z = b"\x00" * 300 + b"x"
    assert rle0_decode(rle0_encode(z)) == z  # >255 run splits
    assert rle0_encode(b"") == b""


def test_nul_input_rejected():
    with pytest.raises(ValueError, match="NUL"):
        bwt_encode(b"a\x00b")


def test_truncated_rle_rejected():
    with pytest.raises(ValueError, match="truncated"):
        rle0_decode(b"abc\x00")


def test_unicode_text_roundtrips():
    s = "héllo wörld 中文 — mixed ünïcode".encode("utf-8")
    assert decompress(compress(s)) == s
