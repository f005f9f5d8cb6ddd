"""Multimodal stage plumbing (decode stubbed; schema/batching real)."""

import pyarrow as pa
import pytest

from webscraper_ray.functions.multimodal import (
    MEDIA_SCHEMA,
    DecodeImage,
    FrameSample,
    ResizeImage,
    fake_media_table,
)


def test_media_schema_roundtrip():
    t = fake_media_table(20)
    assert t.schema.equals(MEDIA_SCHEMA)
    assert t.num_rows == 20
    assert fake_media_table(20).equals(t)  # deterministic


def test_decode_stub_fake_and_raise():
    t = fake_media_table(8)
    out = DecodeImage()(t)
    assert out.column_names == ["media_id", "height", "width", "channels", "feature"]
    assert all(len(f) == 16 for f in out.column("feature").to_pylist())
    with pytest.raises(NotImplementedError, match="imaging library"):
        DecodeImage(decode_stub="raise")(t)


def test_frame_sample_flat_output():
    t = fake_media_table(5)
    out = FrameSample(n_frames=3)(t)
    assert out.num_rows == 15
    assert out.column_names == ["media_id", "frame_ts", "frame_sig"]


def test_resize_metadata_math():
    decoded = DecodeImage()(fake_media_table(10))
    resized = ResizeImage(max_side=64)(decoded)
    for h, w in zip(resized.column("height").to_pylist(), resized.column("width").to_pylist()):
        assert max(h, w) <= 64 and min(h, w) >= 1


def test_actor_pool_pipeline(ray_session):
    import ray.data

    ds = ray.data.from_arrow(fake_media_table(64))
    out = ds.map_batches(
        DecodeImage,
        batch_format="pyarrow",
        batch_size=16,      # small batches: multi-MB payloads in real data
        concurrency=2,      # actor pool: codec/model loaded once per actor
    ).map_batches(
        ResizeImage,
        fn_constructor_kwargs={"max_side": 128},
        batch_format="pyarrow",
        batch_size=16,
        concurrency=2,
    )
    table = out.to_pandas()
    assert len(table) == 64
    assert (table[["height", "width"]].max(axis=1) <= 128).all()


def test_png_codec_roundtrip_all_filters():
    """From-scratch PNG codec: every filter type (0-4) and both layouts
    (grey, RGB) must round-trip byte-exact; malformed bytes raise."""
    import numpy as np
    import pytest

    from webscraper_ray.functions.png import decode_png, encode_png

    rng = np.random.default_rng(11)
    for shape in [(1, 1), (3, 7), (16, 5, 3), (2, 2, 3), (9, 1)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        h = shape[0]
        for filters in [None, [0] * h, [1] * h, [2] * h, [3] * h, [4] * h]:
            back = decode_png(encode_png(img, row_filters=filters))
            assert back.shape == img.shape
            assert np.array_equal(back, img)
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JFIF not a png")
    good = encode_png(np.zeros((4, 4), np.uint8))
    with pytest.raises(ValueError, match="CRC"):
        decode_png(good[:20] + bytes([good[20] ^ 0x5A]) + good[21:])
    with pytest.raises(ValueError, match="truncated|missing"):
        decode_png(good[:-8])


def test_png_synth_and_image_stats_match_formula():
    """synth_png_payload emits REAL PNGs whose decoded pixels follow the
    documented (id*7 + k) % 256 formula — the SQL oracle's contract."""
    import numpy as np

    from webscraper_ray.functions.multimodal import ImageStats, synth_png_payload
    from webscraper_ray.functions.png import PNG_SIGNATURE, decode_png

    import pyarrow as pa

    ids = [0, 1, 2, 7, 16, 255, 511]
    payloads = [synth_png_payload(i) for i in ids]
    assert all(p[:8] == PNG_SIGNATURE for p in payloads)
    for i, p in zip(ids, payloads):
        img = decode_png(p)
        h, w = 4 + i % 5, 4 + i % 6
        ch = 1 if i % 2 == 0 else 3
        assert img.shape == ((h, w) if ch == 1 else (h, w, ch))
        n = h * w * ch
        want = (np.int64(i) * 7 + np.arange(n)) % 256
        assert np.array_equal(img.reshape(-1).astype(np.int64), want)
    batch = pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.large_binary()),
        }
    )
    out = ImageStats()(batch)
    for row in out.to_pylist():
        i = row["media_id"]
        n = row["height"] * row["width"] * row["channels"]
        want = (np.int64(i) * 7 + np.arange(n)) % 256
        assert row["pixel_sum"] == int(want.sum())
        assert row["pixel_min"] == int(want.min())
        assert row["pixel_max"] == int(want.max())


def test_decode_image_real_mode_png_jpeg_and_fimg():
    """DecodeImage('real'): PNG and JPEG decode natively, FIMG parses,
    anything else (video/unknown) still raises — the honest stub now
    covers only formats with no in-container codec."""
    import pytest

    import pyarrow as pa

    from webscraper_ray.functions.multimodal import (
        DecodeImage,
        MEDIA_SCHEMA,
        synth_image_payload,
        synth_jpeg_payload,
        synth_png_payload,
    )

    dec = DecodeImage(decode_stub="real")
    png_h, png_w, png_c = dec._decode(synth_png_payload(5))
    assert (png_h, png_w, png_c) == (4 + 5 % 5, 4 + 5 % 6, 3)
    jpg_h, jpg_w, jpg_c = dec._decode(synth_jpeg_payload(5))
    assert (jpg_h, jpg_w, jpg_c) == (8 * (1 + 5 % 3), 8 * (1 + 5 % 4), 1)
    fimg_h, fimg_w, fimg_c = dec._decode(synth_image_payload(5))
    assert (fimg_w, fimg_h, fimg_c) == (16 + 5 * 37 % 1024, 16 + 5 * 91 % 768, 3)
    with pytest.raises(NotImplementedError, match="codec"):
        dec._decode(b"\x00\x00\x00\x18ftypmp42 fake video bytes")
    # batch path end-to-end
    rows = [
        {"media_id": 1, "kind": "image/png", "payload": synth_png_payload(1), "meta": []},
        {"media_id": 2, "kind": "image/png", "payload": synth_png_payload(2), "meta": []},
    ]
    out = dec(pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA))
    assert out.column("height").to_pylist() == [4 + 1 % 5, 4 + 2 % 5]
    assert out.column("channels").to_pylist() == [3, 1]


# --- WAV / RIFF ---------------------------------------------------------------


def test_wav_roundtrip_mono_and_stereo():
    import numpy as np

    from webscraper_ray.functions.audio import decode_wav, encode_wav

    mono = ((np.arange(37, dtype=np.int64) * 991) % 60001 - 30000).astype(np.int16)
    samples, rate = decode_wav(encode_wav(mono, 16000))
    assert rate == 16000 and np.array_equal(samples, mono)

    stereo = np.stack([mono, mono[::-1]], axis=1)
    samples, rate = decode_wav(encode_wav(stereo, 44100))
    assert rate == 44100 and samples.shape == (37, 2)
    assert np.array_equal(samples, stereo)


def test_wav_skips_unknown_chunks_and_rejects_nonpcm():
    import struct

    import numpy as np
    import pytest as _pytest

    from webscraper_ray.functions.audio import decode_wav, encode_wav

    data = bytearray(encode_wav(np.arange(5, dtype=np.int16), 8000))
    # splice an unknown odd-length chunk right after 'WAVE' (word-aligned)
    extra = b"LIST" + struct.pack("<I", 3) + b"abc\x00"
    data[12:12] = extra
    data[4:8] = struct.pack("<I", struct.unpack("<I", bytes(data[4:8]))[0] + len(extra))
    samples, rate = decode_wav(bytes(data))
    assert rate == 8000 and len(samples) == 5

    bad = bytearray(encode_wav(np.arange(5, dtype=np.int16), 8000))
    i = bad.find(b"fmt ")
    bad[i + 8] = 3  # wFormatTag = IEEE float
    with _pytest.raises(NotImplementedError, match="only PCM"):
        decode_wav(bytes(bad))

    with _pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"not a wav at all")


def test_audio_stats_matches_formula():
    import numpy as np
    import pyarrow as _pa

    from webscraper_ray.functions.multimodal import AudioStats, synth_wav_payload

    ids = [0, 1, 4, 9, 123]
    t = _pa.table(
        {
            "media_id": _pa.array(ids, _pa.int64()),
            "payload": _pa.array(
                [synth_wav_payload(i) for i in ids], _pa.large_binary()
            ),
        }
    )
    out = AudioStats()(t)
    for row, mid in zip(out.to_pylist(), ids):
        n = 16 + mid % 49
        k = np.arange(n, dtype=np.int64)
        s = (mid * 31 + k * 97) % 4001 - 2000
        assert row == {
            "media_id": mid,
            "n_samples": n,
            "sample_rate": 8000 + (mid % 5) * 2000,
            "channels": 1,
            "sample_sum": int(s.sum()),
            "sample_min": int(s.min()),
            "sample_max": int(s.max()),
        }


# --- FVID video container -----------------------------------------------------


def test_fvid_roundtrip_and_errors():
    import pytest as _pytest

    from webscraper_ray.functions.multimodal import encode_fvid, parse_fvid

    frames = [b"frame-one", b"", b"xx" * 100]
    assert parse_fvid(encode_fvid(frames)) == frames
    with _pytest.raises(ValueError, match="FVID"):
        parse_fvid(b"nope")
    with _pytest.raises(ValueError, match="truncated"):
        parse_fvid(encode_fvid(frames)[:-5])


def test_frame_sample_real_decodes_png_frames():
    import numpy as np
    import pyarrow as _pa

    from webscraper_ray.functions.multimodal import FrameSample, synth_video_payload

    ids = [0, 3, 6]
    t = _pa.table(
        {
            "media_id": _pa.array(ids, _pa.int64()),
            "payload": _pa.array(
                [synth_video_payload(i) for i in ids], _pa.large_binary()
            ),
        }
    )
    out = FrameSample(n_frames=4, decode_stub="real")(t)
    assert out.num_rows == 12
    rows = out.to_pylist()
    for mid in ids:
        nf = 2 + mid % 5
        mine = [r for r in rows if r["media_id"] == mid]
        for k, r in enumerate(sorted(mine, key=lambda r: r["sample_k"])):
            j = k * nf // 4
            seed = mid * 1000 + j
            h, w = 4 + seed % 5, 4 + seed % 6
            ch = 1 if seed % 2 == 0 else 3
            px = (np.int64(seed) * 7 + np.arange(h * w * ch, dtype=np.int64)) % 256
            assert r == {
                "media_id": mid,
                "sample_k": k,
                "frame_idx": j,
                "height": h,
                "width": w,
                "channels": ch,
                "pixel_sum": int(px.sum()),
            }


def test_image_stats_dispatches_jpeg_and_rejects_unknown():
    import pyarrow as _pa
    import pytest as _pytest

    from webscraper_ray.functions.multimodal import ImageStats, synth_jpeg_payload

    t = _pa.table(
        {
            "media_id": _pa.array([7], _pa.int64()),
            "payload": _pa.array([synth_jpeg_payload(7)], _pa.large_binary()),
        }
    )
    out = ImageStats()(t)
    assert out.column("height")[0].as_py() == 8 * (1 + 7 % 3)
    bad = _pa.table(
        {
            "media_id": _pa.array([0], _pa.int64()),
            "payload": _pa.array([b"GIF89a..."], _pa.large_binary()),
        }
    )
    with _pytest.raises(ValueError, match="neither PNG nor JPEG"):
        ImageStats()(bad)
