"""GIF87a/89a codec tests: LZW roundtrips (width growth, KwKwK, 4096
reset), container edges, and the deterministic synth corpus formulas."""

import numpy as np
import pytest

from webscraper_ray.functions.gif import (
    GIF_SIGNATURE,
    _lzw_compress,
    _lzw_decompress,
    decode_gif,
    encode_gif,
)
from webscraper_ray.functions.multimodal import _gif_palette, synth_gif_payload


def _rt(idx: np.ndarray, pal: np.ndarray) -> None:
    i2, p2 = decode_gif(encode_gif(idx, pal))
    assert (i2 == idx).all()
    assert (p2[: pal.shape[0]] == pal).all()


def test_roundtrip_fuzz_all_palette_sizes():
    rng = np.random.default_rng(11)
    for _ in range(40):
        h = int(rng.integers(1, 40))
        w = int(rng.integers(1, 40))
        nc = int(rng.integers(2, 257))
        _rt(
            rng.integers(0, nc, (h, w)).astype(np.uint8),
            rng.integers(0, 256, (nc, 3)).astype(np.uint8),
        )


def test_roundtrip_large_random_hits_4096_reset():
    # 12000 random 8-bit pixels force the dictionary past 4096 entries,
    # so the encoder emits CLEAR mid-stream and the decoder must reset.
    rng = np.random.default_rng(3)
    idx = rng.integers(0, 256, (100, 120)).astype(np.uint8)
    pal = rng.integers(0, 256, (256, 3)).astype(np.uint8)
    _rt(idx, pal)


def test_roundtrip_repetitive_compresses_and_kwkwk():
    # aaaa... is the canonical KwKwK (code == next_code) stream
    pal = np.arange(48, dtype=np.uint8).reshape(16, 3)
    idx = np.zeros((9, 31), np.uint8)
    _rt(idx, pal)
    data = encode_gif(idx, pal)
    assert len(data) < 13 + 16 * 3 + 10 + idx.size // 4  # really compressed
    rep = np.tile(np.arange(8, dtype=np.uint8), (64, 100))[:, :173]
    _rt(rep, pal)


def test_single_pixel_and_two_colors():
    _rt(np.array([[1]], np.uint8), np.array([[0, 0, 0], [255, 255, 255]], np.uint8))


def test_lzw_stream_direct():
    rng = np.random.default_rng(5)
    for mcs in (2, 4, 8):
        data = bytes(rng.integers(0, 1 << mcs, 5000, dtype=np.uint8))
        assert _lzw_decompress(_lzw_compress(data, mcs), mcs, len(data)) == data


def test_gif89a_extension_blocks_skipped():
    pal = _gif_palette()
    idx = (np.arange(30, dtype=np.uint8) % 16).reshape(5, 6)
    raw = bytearray(encode_gif(idx, pal))
    raw[4:6] = b"9a"
    # splice a graphic-control extension before the image descriptor
    at = 13 + 16 * 3
    ext = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    spliced = bytes(raw[:at]) + ext + bytes(raw[at:])
    i2, p2 = decode_gif(spliced)
    assert (i2 == idx).all()
    assert (p2[:16] == pal).all()


def test_corrupt_raise():
    pal = _gif_palette()
    idx = np.zeros((4, 4), np.uint8)
    with pytest.raises(ValueError):
        decode_gif(b"NOPE" + bytes(20))
    with pytest.raises(ValueError):
        decode_gif(encode_gif(idx, pal)[:-2])  # drop terminator+trailer


def test_interlaced_roundtrip():
    rng = np.random.default_rng(7)
    pal = _gif_palette()
    # heights straddling the pass boundaries: <2, <3, <5, <9, larger
    for h in (1, 2, 3, 4, 5, 8, 9, 16, 23):
        idx = rng.integers(0, 16, (h, 11)).astype(np.uint8)
        i2, _ = decode_gif(encode_gif(idx, pal, interlaced=True))
        assert (i2 == idx).all()


def test_interlaced_rows_actually_reordered_on_disk():
    # rows constant per row-index: the interlaced file must store row 4
    # (pass 2's first row) second, so a decoder that IGNORED the flag
    # would read the wrong image. Pin the storage layout itself.
    pal = _gif_palette()
    idx = np.repeat(np.arange(9, dtype=np.uint8)[:, None], 6, axis=1) % 16
    seq = encode_gif(idx, pal)
    il = encode_gif(idx, pal, interlaced=True)
    assert seq != il
    from webscraper_ray.functions.gif import _interlace_order

    order = _interlace_order(9)
    assert list(order) == [0, 8, 4, 2, 6, 1, 3, 5, 7]
    # decoding the interlaced bytes AS IF sequential yields the permuted rows
    hacked = bytearray(il)
    at = 13 + 16 * 3
    assert hacked[at + 9] & 0x40
    hacked[at + 9] &= ~0x40
    wrong, _ = decode_gif(bytes(hacked))
    assert (wrong == idx[order]).all()
    assert not (wrong == idx).all()


def test_synth_corpus_matches_formula():
    for mid in (0, 1, 5, 17, 123, 9999):
        payload = synth_gif_payload(mid)
        assert payload[:4] == GIF_SIGNATURE
        idx, pal = decode_gif(payload)
        h, w = 8 + mid % 7, 8 + mid % 9
        assert idx.shape == (h, w)
        k = np.arange(h * w)
        exp = np.where((k // 5) % 2 == 0, (mid + k) % 16, mid % 16)
        assert (idx.reshape(-1) == exp).all()
        assert (pal[:16] == _gif_palette()).all()


def test_multiframe_raises_loudly():
    """Splicing a second image block before the trailer must raise, not
    silently return frame 1 (the docstring's single-frame contract)."""
    import pytest

    a = encode_gif(np.arange(16, dtype=np.uint8).reshape(4, 4), _gif_palette())
    # second frame = everything after the header+GCT of another encode
    b = encode_gif(np.zeros((4, 4), np.uint8), _gif_palette())
    frame2 = b[13 + 16 * 3 : -1]  # image descriptor..terminator, no trailer
    spliced = a[:-1] + frame2 + b"\x3b"
    with pytest.raises(ValueError, match="multi-frame"):
        decode_gif(spliced)
    # trailing garbage instead of a trailer also raises
    with pytest.raises(ValueError):
        decode_gif(a[:-1] + b"\x7f\x3b")
