"""SMB join: brute parity, one-side uniqueness guard, co-partitioning
manifest check, per_bucket aggregation hook."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _store(tmp, name, table, key, num_buckets=4):
    import ray.data

    from webscraper_ray.functions.smbjoin import build_smb_store

    d = str(tmp / name)
    build_smb_store(ray.data.from_arrow(table), key, d, num_buckets=num_buckets)
    return d


@pytest.mark.usefixtures("ray_session")
def test_smb_join_matches_bruteforce(tmp_path):
    from webscraper_ray.functions.smbjoin import smb_join

    rng = np.random.default_rng(3)
    left = pa.table(
        {
            "k": pa.array(np.arange(50), pa.int64()),
            "tag": pa.array([f"t{i%7}" for i in range(50)]),
        }
    )
    rk = rng.integers(0, 80, size=300)  # some keys miss the one-side
    right = pa.table(
        {
            "k": pa.array(rk, pa.int64()),
            "v": pa.array(rng.integers(0, 1000, size=300), pa.int64()),
        }
    )
    ld = _store(tmp_path, "l", left, "k")
    rd = _store(tmp_path, "r", right, "k")
    out = (
        smb_join(ld, rd, "k", "k", ["k", "tag"], ["v"])
        .to_pandas()
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    exp = (
        left.to_pandas()
        .merge(right.to_pandas(), on="k")
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    assert out.equals(exp[["k", "tag", "v"]].reset_index(drop=True))


@pytest.mark.usefixtures("ray_session")
def test_smb_join_guards(tmp_path):
    from webscraper_ray.functions.smbjoin import smb_join

    dup = pa.table({"k": pa.array([1, 1, 2], pa.int64()), "x": pa.array([1, 2, 3], pa.int64())})
    right = pa.table({"k": pa.array([1, 2], pa.int64()), "v": pa.array([5, 6], pa.int64())})
    ld = _store(tmp_path, "dup", dup, "k")
    rd = _store(tmp_path, "r2", right, "k")
    with pytest.raises(Exception, match="duplicate k"):
        smb_join(ld, rd, "k", "k", ["k"], ["v"]).take_all()
    # mismatched bucket counts refuse loudly
    rd8 = _store(tmp_path, "r8", right, "k", num_buckets=8)
    lgood = _store(tmp_path, "lg", right, "k")
    with pytest.raises(ValueError, match="not co-partitioned"):
        smb_join(lgood, rd8, "k", "k", ["k"], ["v"])


@pytest.mark.usefixtures("ray_session")
def test_smb_join_per_bucket_agg(tmp_path):
    from webscraper_ray.functions.smbjoin import smb_join

    left = pa.table({"k": pa.array([1, 2, 3], pa.int64())})
    right = pa.table(
        {
            "k": pa.array([1, 1, 2, 9], pa.int64()),
            "v": pa.array([10, 20, 5, 99], pa.int64()),
        }
    )
    ld = _store(tmp_path, "al", left, "k")
    rd = _store(tmp_path, "ar", right, "k")

    def agg(t: pa.Table) -> pa.Table:
        g = t.group_by("k").aggregate([("v", "sum")])
        return g.rename_columns(["k", "v_sum"])

    out = (
        smb_join(ld, rd, "k", "k", ["k"], ["v"], per_bucket=agg)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert out.to_dict("list") == {"k": [1, 2], "v_sum": [30, 5]}
