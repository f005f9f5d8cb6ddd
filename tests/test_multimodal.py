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
