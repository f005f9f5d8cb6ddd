"""Hot-key time-slicing for asof_join (functions/joins.py): output
equivalence vs the baseline path, boundary-row tie carry, degenerate
single-timestamp keys, left-hot keys with thin right sides, and the
hot-key cap guard."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from webscraper_ray.functions.joins import (
    MAX_HOT_KEYS,
    _hot_part_ids,
    asof_join,
)

US = pa.timestamp("us")


def _ds(tbl: pa.Table, parts: int = 4):
    return ray.data.from_arrow(tbl).repartition(parts)


def _left(ids, keys, ts):
    return _ds(
        pa.table(
            {
                "eid": pa.array(np.asarray(ids, dtype=np.int64)),
                "k": pa.array(np.asarray(keys, dtype=np.int64)),
                "ts": pa.array(
                    np.asarray(ts, dtype=np.int64).astype("datetime64[us]"), US
                ),
            }
        )
    )


def _right(keys, ts, val):
    return _ds(
        pa.table(
            {
                "k": pa.array(np.asarray(keys, dtype=np.int64)),
                "rts": pa.array(
                    np.asarray(ts, dtype=np.int64).astype("datetime64[us]"), US
                ),
                "val": pa.array(np.asarray(val, dtype=np.int64)),
            }
        )
    )


KW = dict(
    left_key="k", left_ts="ts", right_key="k", right_ts="rts",
    right_payload=["val"],
)


def _frames_equal(a, b):
    a = a.sort_values("eid").reset_index(drop=True)
    b = b.sort_values("eid").reset_index(drop=True)
    pd.testing.assert_frame_equal(a[sorted(a.columns)], b[sorted(b.columns)])


def test_hot_path_equals_baseline_random(ray_session):
    rng = np.random.default_rng(7)
    lk = np.concatenate([np.full(400, 5), rng.integers(50, 70, 200)])
    lts = rng.integers(0, 40_000, lk.size)
    rk = np.concatenate([np.full(8_000, 5), rng.integers(50, 70, 1_500)])
    rts = rng.integers(0, 40_000, rk.size)
    left = _left(np.arange(lk.size), lk, lts)
    right = _right(rk, rts, np.arange(rk.size))
    base = asof_join(left, right, **KW).to_pandas()
    hot = asof_join(
        left, right, **KW, hot_key_threshold=500, hot_slices=8
    ).to_pandas()
    _frames_equal(base, hot)


def test_boundary_carries_max_tie_across_slices(ray_session):
    """Two right rows share the hot key's earliest timestamp with
    different payloads; a left probe many slices later must still get
    the MAX tie — the prefix-argmax must not lose the tie contract."""
    n = 2_000
    rk = np.full(n + 2, 9)
    rts = np.concatenate([[0, 0], np.arange(1, n + 1)])
    val = np.concatenate([[111, 777], np.zeros(n, dtype=int)])
    # probe at ts=0: only the two tied rows qualify -> max tie 777
    left = _left([1], [9], [0])
    right = _right(rk, rts, val)
    out = asof_join(
        left, right, **KW, hot_key_threshold=100, hot_slices=16
    ).to_pandas()
    assert out["val"].tolist() == [777]


def test_single_timestamp_giant_key_still_correct(ray_session):
    """All rows of the hot key share ONE timestamp — unsliceable by
    definition (span 1 -> slice 0); output must stay correct."""
    n = 3_000
    left = _left([1, 2], [3, 3], [5, 999])
    right = _right(np.full(n, 3), np.full(n, 7), np.arange(n))
    out = asof_join(
        left, right, **KW, hot_key_threshold=100, hot_slices=8
    ).to_pandas()
    # ts=5 < 7 -> no match (inner drop); ts=999 -> latest tie = n-1
    assert out["eid"].tolist() == [2]
    assert out["val"].tolist() == [n - 1]


def test_left_hot_key_with_thin_right(ray_session):
    """A key hot on the LEFT only: slicing comes from the right side's
    (thin) ts range; every left probe must still resolve."""
    n = 5_000
    lts = np.linspace(0, 100_000, n).astype(np.int64)
    left = _left(np.arange(n), np.full(n, 4), lts)
    right = _right([4, 4, 4], [10, 50_000, 90_000], [1, 2, 3])
    base = asof_join(left, right, **KW).to_pandas()
    hot = asof_join(
        left, right, **KW, hot_key_threshold=1_000, hot_slices=8
    ).to_pandas()
    _frames_equal(base, hot)
    assert len(hot) == (lts >= 10).sum()


def test_hot_key_with_no_right_rows_drops(ray_session):
    left = _left(np.arange(2_000), np.full(2_000, 6), np.arange(2_000))
    right = _right([8], [0], [1])  # nothing for key 6
    out = asof_join(
        left, right, **KW, hot_key_threshold=1_000, hot_slices=4
    ).to_pandas()
    assert len(out) == 0


def test_hot_rows_actually_spread_over_slices():
    """The routing itself: a giant key's rows must land in MULTIPLE
    partition ids past the base range."""
    n = 1_000
    keys = pa.chunked_array([pa.array(np.full(n, 42, dtype=np.int64))])
    ts = pa.chunked_array(
        [pa.array(np.arange(n, dtype=np.int64).astype("datetime64[us]"), US)]
    )
    base = pa.array(np.zeros(n, dtype=np.int32))
    parts = _hot_part_ids(
        keys, ts, base,
        hot_keys=pa.array([42], pa.int64()),
        tmin=np.array([0], dtype=np.int64),
        tmax=np.array([n - 1], dtype=np.int64),
        num_partitions=32,
        hot_slices=8,
    ).to_numpy(zero_copy_only=False)
    assert set(parts) == set(range(32, 40))


def test_threshold_guard(ray_session):
    left = _left([1], [1], [0])
    right = _right([1], [0], [1])
    with pytest.raises(ValueError, match="hot_key_threshold"):
        asof_join(left, right, **KW, hot_key_threshold=0)


def test_hot_cap_guard(ray_session):
    n_keys = MAX_HOT_KEYS + 1
    keys = np.repeat(np.arange(n_keys), 3)
    left = _left(np.arange(keys.size), keys, np.zeros(keys.size))
    right = _right(keys, np.zeros(keys.size), np.arange(keys.size))
    with pytest.raises(ValueError, match="hot keys"):
        asof_join(left, right, **KW, hot_key_threshold=3).materialize()


# --- range_count_join hot-key slicing ---

from webscraper_ray.functions.joins import range_count_join  # noqa: E402

RKW = dict(
    left_key="k", left_ts="ts", right_key="k", right_ts="rts",
    lo_offset_us=-1_000, hi_offset_us=0, count_as="n",
)


def test_range_hot_equals_baseline_random(ray_session):
    rng = np.random.default_rng(13)
    lk = np.concatenate([np.full(300, 5), rng.integers(50, 60, 150)])
    lts = rng.integers(0, 20_000, lk.size)
    rk = np.concatenate([np.full(6_000, 5), rng.integers(50, 60, 900)])
    rts = rng.integers(0, 20_000, rk.size)
    left = _left(np.arange(lk.size), lk, lts)
    right = _ds(
        pa.table(
            {
                "k": pa.array(rk.astype(np.int64)),
                "rts": pa.array(rts.astype("datetime64[us]"), US),
            }
        )
    )
    base = range_count_join(left, right, **RKW).to_pandas()
    hot = range_count_join(
        left, right, **RKW, hot_key_threshold=500, hot_slices=8
    ).to_pandas()
    _frames_equal(base, hot)
    # sanity: left semantics, every left row survives
    assert len(hot) == lk.size


def test_range_hot_window_spans_slice_boundary(ray_session):
    """Right rows sitting exactly at a slice boundary must be counted by
    probes on BOTH sides of it — the 2-copy replication contract."""
    n = 4_000
    rts = np.arange(n)  # span 4000, 8 slices -> width 1000 > window 100
    left_ts = [999, 1_000, 1_049, 3_999]
    left = _left(np.arange(4), np.full(4, 1), left_ts)
    right = _ds(
        pa.table(
            {
                "k": pa.array(np.full(n, 1, dtype=np.int64)),
                "rts": pa.array(rts.astype("datetime64[us]"), US),
            }
        )
    )
    out = (
        range_count_join(
            left,
            right,
            left_key="k",
            left_ts="ts",
            right_key="k",
            right_ts="rts",
            lo_offset_us=-100,
            hi_offset_us=0,
            count_as="n",
            hot_key_threshold=100,
            hot_slices=8,
        )
        .to_pandas()
        .sort_values("eid")
    )
    # window [t-100, t): t=999 -> rts 899..998 = 100; t=1000 (boundary)
    # -> 900..999 = 100 straddling slice 0/1; t=1049 -> 949..1048 = 100
    # straddling; t=3999 -> 3899..3998 = 100
    assert out["n"].tolist() == [100, 100, 100, 100]


def test_range_hot_zero_and_negative_window(ray_session):
    left = _left([1], [1], [500])
    right = _ds(
        pa.table(
            {
                "k": pa.array(np.full(2_000, 1, dtype=np.int64)),
                "rts": pa.array(
                    np.arange(2_000).astype("datetime64[us]"), US
                ),
            }
        )
    )
    out = range_count_join(
        left, right, left_key="k", left_ts="ts", right_key="k",
        right_ts="rts", lo_offset_us=0, hi_offset_us=0, count_as="n",
        hot_key_threshold=100, hot_slices=4,
    ).to_pandas()
    assert out["n"].tolist() == [0]


def test_hot_paths_unit_safe_with_ns_timestamps(ray_session):
    """Regression (review finding): hot-path slicing must pin ts to µs
    whatever the column unit — ns columns once sliced with offsets
    interpreted in the wrong unit and silently lost in-window rows."""
    NS = pa.timestamp("ns")
    n = 4_000
    lts = np.array([999, 1_000, 1_049, 3_999], dtype=np.int64)
    left = _ds(
        pa.table(
            {
                "eid": pa.array(np.arange(4, dtype=np.int64)),
                "k": pa.array(np.full(4, 1, dtype=np.int64)),
                "ts": pa.array((lts * 1_000).astype("datetime64[ns]"), NS),
            }
        )
    )
    right = _ds(
        pa.table(
            {
                "k": pa.array(np.full(n, 1, dtype=np.int64)),
                "rts": pa.array(
                    (np.arange(n) * 1_000).astype("datetime64[ns]"), NS
                ),
            }
        )
    )
    out = (
        range_count_join(
            left, right, left_key="k", left_ts="ts", right_key="k",
            right_ts="rts", lo_offset_us=-100, hi_offset_us=0, count_as="n",
            hot_key_threshold=100, hot_slices=8,
        )
        .to_pandas()
        .sort_values("eid")
    )
    assert out["n"].tolist() == [100, 100, 100, 100]
    # asof twin: ns columns through the sliced path
    rightv = _ds(
        pa.table(
            {
                "k": pa.array(np.full(n, 1, dtype=np.int64)),
                "rts": pa.array(
                    (np.arange(n) * 1_000).astype("datetime64[ns]"), NS
                ),
                "val": pa.array(np.arange(n, dtype=np.int64)),
            }
        )
    )
    got = asof_join(
        left, rightv, left_key="k", left_ts="ts", right_key="k",
        right_ts="rts", right_payload=["val"], hot_key_threshold=100,
        hot_slices=8,
    ).to_pandas().sort_values("eid")
    assert got["val"].tolist() == [999, 1_000, 1_049, 3_999]
