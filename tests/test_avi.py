"""RIFF-AVI MJPEG container: structural round-trip, pad-byte
alignment, and loud failures on corruption / foreign codecs."""

import struct

import numpy as np
import pytest

from webscraper_ray.functions.avi import encode_avi_mjpeg, parse_avi_mjpeg
from webscraper_ray.functions.jpeg import encode_jpeg


def _const_jpeg(v: int, hb: int = 1, wb: int = 2) -> bytes:
    q = np.full(64, 16, dtype=np.int64)
    q[0] = 8
    img = np.full((8 * hb, 8 * wb), v, dtype=np.uint8)
    return encode_jpeg(img, quant=q)


def test_roundtrip_preserves_frame_bytes():
    frames = [_const_jpeg(v) for v in (0, 17, 255)]
    data = encode_avi_mjpeg(frames, width=16, height=8)
    assert parse_avi_mjpeg(data) == frames


def test_odd_length_frames_pad_correctly():
    # force odd payload sizes so the RIFF pad byte is exercised
    frames = []
    for v in (3, 9):
        f = _const_jpeg(v)
        if len(f) % 2 == 0:
            # JPEG parsers stop at EOI; a trailing byte keeps the frame
            # valid while making the chunk length odd
            f += b"\x00"
        frames.append(f)
    assert all(len(f) % 2 == 1 for f in frames)
    data = encode_avi_mjpeg(frames, width=16, height=8)
    assert parse_avi_mjpeg(data) == frames


def test_bad_signature_raises():
    with pytest.raises(ValueError, match="RIFF/AVI"):
        parse_avi_mjpeg(b"RIFX" + b"\x00" * 20)
    with pytest.raises(ValueError, match="RIFF/AVI"):
        parse_avi_mjpeg(b"RIFF" + struct.pack("<I", 4) + b"WAVE")


def test_overrunning_chunk_raises():
    data = bytearray(encode_avi_mjpeg([_const_jpeg(5)], width=16, height=8))
    # corrupt the first LIST size to point past the file
    pos = data.index(b"LIST")
    struct.pack_into("<I", data, pos + 4, 2**30)
    with pytest.raises(ValueError, match="overruns"):
        parse_avi_mjpeg(bytes(data))


def test_non_mjpeg_handler_raises_not_implemented():
    data = encode_avi_mjpeg([_const_jpeg(5)], width=16, height=8)
    patched = data.replace(b"vidsMJPG", b"vidsH264", 1)
    with pytest.raises(NotImplementedError, match="H264"):
        parse_avi_mjpeg(patched)


def test_no_frames_rejected_at_encode():
    with pytest.raises(ValueError, match="at least one frame"):
        encode_avi_mjpeg([], width=8, height=8)


# ---- G.711 mu-law (functions/audio.py) ----

def test_ulaw_roundtrip_all_codewords():
    import numpy as np
    from webscraper_ray.functions.audio import ulaw_decode, ulaw_encode

    codes = np.arange(256, dtype=np.uint8)
    dec = ulaw_decode(codes)
    # ITU G.711 mu-law range is +-8031 at the 14-bit scale
    assert dec.min() == -8031 and dec.max() == 8031
    # encode(decode(c)) reproduces every decoder output exactly
    assert np.array_equal(ulaw_decode(ulaw_encode(dec)), dec)


def test_ulaw_known_values():
    import numpy as np
    from webscraper_ray.functions.audio import ulaw_decode

    # 0xFF -> u=0x00 -> +((2*0+33)<<0)-33 = 0; 0x7F -> u=0x80 -> -0
    got = ulaw_decode(np.array([0xFF, 0x7F, 0x00, 0x80], dtype=np.uint8))
    assert got[0] == 0 and got[1] == 0
    # 0x00 -> u=0xFF: sign=1, e=7, m=15 -> -(63<<7)+33 = -8031
    assert got[2] == -8031 and got[3] == 8031
