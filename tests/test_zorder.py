"""Z-order layout — interleave kernel, bucketed write, 2-D file pruning."""

import os

import numpy as np
import pyarrow as pa

import ray.data

from webscraper_ray.functions.zorder import (
    spread16,
    zorder_write,
    zrange_probe,
    zvalue,
)


def test_spread_and_interleave_match_bitwise_reference():
    rng = np.random.RandomState(5)
    qx = rng.randint(0, 65536, 200).astype(np.uint32)
    qy = rng.randint(0, 65536, 200).astype(np.uint32)
    got = zvalue(qx, qy)
    for x, y, z in zip(qx.tolist(), qy.tolist(), got.tolist()):
        want = 0
        for i in range(16):
            want |= ((x >> i) & 1) << (2 * i)
            want |= ((y >> i) & 1) << (2 * i + 1)
        assert z == want
    # spread16 alone: even bit positions only
    assert int(spread16(np.array([0xFFFF], dtype=np.uint32))[0]) == 0x55555555


def _grid_ds(n=2000, seed=9):
    rng = np.random.RandomState(seed)
    return ray.data.from_arrow(
        pa.table(
            {
                "key": pa.array(np.arange(n), pa.int64()),
                "x": pa.array(rng.randint(0, 10_000, n), pa.int64()),
                "y": pa.array(rng.randint(0, 10_000, n), pa.int64()),
            }
        )
    )


def test_zorder_probe_prunes_buckets_and_matches_full_scan(
    ray_session, tmp_path, monkeypatch
):
    store = str(tmp_path / "zstore")
    ds = _grid_ds()
    zorder_write(ds, "x", "y", store, bucket_bits=4)
    on_disk = [d for d in os.listdir(store) if d.startswith("bucket=")]
    assert len(on_disk) > 4  # layout really fans out

    read_paths = []
    real_read = ray.data.read_parquet

    def spy_read(paths, **kw):
        read_paths.append(paths if isinstance(paths, list) else [paths])
        return real_read(paths, **kw)

    monkeypatch.setattr(ray.data, "read_parquet", spy_read)
    # a small corner box: z-locality must let the probe skip buckets
    got = zrange_probe(store, "x", "y", (0, 1500), (0, 1500)).to_pandas()
    monkeypatch.undo()

    assert len(read_paths) == 1
    touched = {os.path.basename(p) for p in read_paths[0]}
    assert touched < set(on_disk)  # STRICT subset: pruning happened

    df = ds.to_pandas()
    want = df[(df.x <= 1500) & (df.y <= 1500)]
    assert sorted(got["key"]) == sorted(want["key"])


def test_empty_probe_box_reads_nothing(ray_session, tmp_path, monkeypatch):
    store = str(tmp_path / "zstore2")
    zorder_write(_grid_ds(500, seed=1), "x", "y", store, bucket_bits=2)
    read_paths = []
    real_read = ray.data.read_parquet

    def spy_read(paths, **kw):
        read_paths.append(paths)
        return real_read(paths, **kw)

    monkeypatch.setattr(ray.data, "read_parquet", spy_read)
    got = zrange_probe(
        store, "x", "y", (100_000, 200_000), (100_000, 200_000)
    ).to_pandas()
    monkeypatch.undo()
    assert len(got) == 0 and read_paths == []
