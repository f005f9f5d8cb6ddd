"""Value-based RANGE window frame — peer inclusion + overflow guard."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from webscraper_ray.functions.windows import range_rolling


def _events(rows):
    eid, uid, ts, v = zip(*rows)
    return ray.data.from_arrow(
        pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "user_id": pa.array(uid, pa.int64()),
                "ts": pa.array(
                    np.array(ts, dtype="datetime64[us]"), pa.timestamp("us")
                ),
                "value": pa.array(v, pa.float64()),
            }
        )
    )


def _by_eid(ds):
    df = ds.to_pandas().set_index("event_id").sort_index()
    return df["win_n"].to_dict(), df["win_sum"].to_dict()


def test_range_frame_is_value_based_and_includes_ts_peers(ray_session):
    one_h = 3_600_000_000
    rows = [
        # user 1: events at 0:00, 0:30, 1:00, 2:30
        (1, 1, "2024-01-01T00:00", 1.0),
        (2, 1, "2024-01-01T00:30", 2.0),
        (3, 1, "2024-01-01T01:00", 4.0),  # frame spans all three (>= -1h)
        (4, 1, "2024-01-01T02:30", 8.0),  # alone: 1:30 gap empties the frame
        # user 2: ts PEERS — RANGE ... CURRENT ROW includes BOTH peers in
        # BOTH frames (row frames would not)
        (5, 2, "2024-01-01T00:00", 1.0),
        (6, 2, "2024-01-01T00:00", 2.0),
        # user 3 boundary: exactly window-old rows are IN ([t-W, t])
        (7, 3, "2024-01-01T00:00", 1.0),
        (8, 3, "2024-01-01T01:00", 2.0),
    ]
    n, s = _by_eid(range_rolling(_events(rows), window_us=one_h))
    assert n == {1: 1, 2: 2, 3: 3, 4: 1, 5: 2, 6: 2, 7: 1, 8: 2}
    assert s[3] == pytest.approx(7.0)
    assert s[4] == pytest.approx(8.0)
    assert s[5] == s[6] == pytest.approx(3.0)
    assert s[8] == pytest.approx(3.0)


def test_range_rolling_overflow_guard_is_loud(ray_session):
    # one partition whose total shifted span cannot fit int64
    far = np.iinfo(np.int64).max - 10
    rows = [
        (1, 1, "1970-01-01T00:00", 1.0),
        (2, 1, "1970-01-01T00:01", 1.0),
    ]
    ds = _events(rows)
    # window so large that span + window overflows the shift domain
    with pytest.raises((OverflowError, Exception)) as ei:
        range_rolling(ds, window_us=int(far)).to_pandas()
    assert "shift domain" in str(ei.value) or "Overflow" in str(
        type(ei.value).__name__
    ) or "overflow" in str(ei.value).lower()
