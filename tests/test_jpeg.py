"""From-scratch baseline JPEG codec (functions/jpeg.py): round-trips
through every encoder/decoder path — grayscale, RGB 4:4:4 / 4:2:2 /
4:2:0, restart markers, non-multiple-of-8 dims, custom quant tables —
plus the constant-block exactness contract the SQL-gated corpus
relies on, and loud failures on unsupported streams."""

import numpy as np
import pytest

from webscraper_ray.functions.jpeg import JPEG_SIGNATURE, decode_jpeg, encode_jpeg


def _maxdiff(a: np.ndarray, b: np.ndarray) -> int:
    return int(np.abs(a.astype(np.int64) - b.astype(np.int64)).max())


def test_gray_roundtrip_quant1_noise():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (24, 40), dtype=np.uint8)
    data = encode_jpeg(img, quant=1)
    assert data[:2] == JPEG_SIGNATURE and data[-2:] == b"\xff\xd9"
    out = decode_jpeg(data)
    assert out.shape == img.shape
    assert _maxdiff(out, img) <= 1  # float DCT round-trip at step 1


def test_gray_roundtrip_odd_dims():
    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, (13, 21), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quant=1))
    assert out.shape == (13, 21)
    assert _maxdiff(out, img) <= 1


def test_rgb_444_roundtrip():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (16, 24, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quant=1, subsampling="444"))
    assert out.shape == img.shape
    # YCbCr forward+inverse rounding costs a few steps per channel
    assert _maxdiff(out, img) <= 4


@pytest.mark.parametrize("sub", ["420", "422"])
def test_rgb_subsampled_roundtrip_smooth(sub):
    # chroma subsampling can't round-trip noise; use a smooth gradient
    yy, xx = np.mgrid[0:32, 0:32]
    img = np.stack(
        [(yy * 3 + xx) % 256, (yy + xx * 2) % 256, (yy * 2 + xx * 2) % 256], axis=-1
    ).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quant=1, subsampling=sub))
    assert out.shape == img.shape
    diff = np.abs(out.astype(int) - img.astype(int)).mean()
    assert diff < 4.0


def test_restart_interval_roundtrip():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (40, 64), dtype=np.uint8)
    data = encode_jpeg(img, quant=1, restart_interval=3)
    assert b"\xff\xd0" in data  # RST0 actually emitted
    assert _maxdiff(decode_jpeg(data), img) <= 1


def test_constant_block_exactness_dc_step_8():
    # the SQL-gated corpus contract: constant 8x8 blocks + DC step 8
    # decode EXACTLY (only DC energy; quantized DC == v - 128)
    q = np.full(64, 16, dtype=np.int64)
    q[0] = 8
    vals = ((np.arange(12).reshape(3, 4) * 37 + 5) % 256).astype(np.uint8)
    img = np.kron(vals, np.ones((8, 8), dtype=np.uint8))
    out = decode_jpeg(encode_jpeg(img, quant=q))
    assert np.array_equal(out, img)


def test_lossy_quant_table_still_decodes():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quant=32))
    assert out.shape == img.shape  # heavy quant: valid stream, lossy pixels


def test_bad_soi_raises():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x00\x01rest")


def test_progressive_raises_not_implemented():
    # splice a SOF2 marker into an otherwise valid prefix
    img = np.zeros((8, 8), dtype=np.uint8)
    data = bytearray(encode_jpeg(img))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="baseline"):
        decode_jpeg(bytes(data))


def test_truncated_entropy_raises():
    img = np.arange(64, dtype=np.uint8).reshape(8, 8) * 3 % 256
    data = encode_jpeg(img, quant=1)
    with pytest.raises(ValueError):
        decode_jpeg(data[:-10])  # cuts EOI + tail entropy bytes
