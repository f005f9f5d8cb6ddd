"""Incremental aggregate maintenance — exact merge, bounded state."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data

from webscraper_ray.functions.incragg import build_agg_state, merge_agg_state


def _events(rows):
    et, v = zip(*rows)
    return ray.data.from_arrow(
        pa.table(
            {
                "event_type": pa.array(et, pa.string()),
                "value": pa.array(v, pa.float64()),
            }
        )
    )


def test_merge_equals_full_recompute_with_overlap_and_new_groups(
    ray_session, tmp_path
):
    base = [("a", 1.5), ("a", 2.25), ("b", 10.0)]
    delta = [("a", 0.25), ("c", 7.125)]  # overlaps 'a', introduces 'c'
    state = str(tmp_path / "state")
    build_agg_state(_events(base), state)
    out = (
        merge_agg_state(state, _events(delta))
        .to_pandas()
        .set_index("event_type")
        .sort_index()
    )
    assert out["n_events"].to_dict() == {"a": 3, "b": 1, "c": 1}
    assert out["sum_value"]["a"] == pytest.approx(4.0)
    assert out["sum_value"]["b"] == pytest.approx(10.0)
    assert out["sum_value"]["c"] == pytest.approx(7.125)


def test_state_is_group_count_sized(ray_session, tmp_path):
    # 1000 events over 3 groups -> state parquet holds exactly 3 rows
    rng = np.random.RandomState(0)
    rows = [("xyz"[int(i)], float(v)) for i, v in zip(rng.randint(0, 3, 1000),
                                                     rng.rand(1000))]
    state = str(tmp_path / "state")
    build_agg_state(_events(rows), state)
    n = sum(
        pq.read_metadata(os.path.join(state, f)).num_rows
        for f in os.listdir(state)
        if f.endswith(".parquet")
    )
    assert n == 3
