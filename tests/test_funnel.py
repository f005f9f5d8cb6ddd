"""Conversion funnel — strict ordering, vectorized multi-user pass."""

import numpy as np
import pyarrow as pa

import ray.data

from webscraper_ray.functions.windows import funnel_stages


def _events(rows):
    uid, ts, et = zip(*rows)
    return ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array(uid, pa.int64()),
                "ts": pa.array(
                    np.array(ts, dtype="datetime64[us]"), pa.timestamp("us")
                ),
                "event_type": pa.array(et, pa.string()),
            }
        )
    )


def _stages(ds):
    df = ds.to_pandas()
    return dict(zip(df["user_id"], df["reached_stage"]))


def test_strict_ordering_between_stages(ray_session):
    rows = [
        # user 1: full funnel in order -> 3
        (1, "2024-01-01T00:00", "view"),
        (1, "2024-01-01T01:00", "click"),
        (1, "2024-01-01T02:00", "purchase"),
        # user 2: click BEFORE view -> stuck at 1
        (2, "2024-01-01T00:00", "click"),
        (2, "2024-01-01T01:00", "view"),
        # user 3: purchase before click -> 2 (view, click; purchase too early)
        (3, "2024-01-01T00:00", "view"),
        (3, "2024-01-01T00:30", "purchase"),
        (3, "2024-01-01T01:00", "click"),
        # user 4: no view at all -> 0
        (4, "2024-01-01T00:00", "click"),
        (4, "2024-01-01T01:00", "purchase"),
        # user 5: later second view can't resurrect an early click, but a
        # later click can: view(2h) click(3h) -> 2
        (5, "2024-01-01T00:00", "click"),
        (5, "2024-01-01T02:00", "view"),
        (5, "2024-01-01T03:00", "click"),
    ]
    got = _stages(funnel_stages(_events(rows)))
    assert got == {1: 3, 2: 1, 3: 2, 4: 0, 5: 2}


def test_parallelism_invariance(ray_session):
    rng = np.random.default_rng(3)
    kinds = ["view", "click", "purchase", "signup", "error"]
    rows = [
        (
            int(rng.integers(1, 40)),
            np.datetime64("2024-01-01") + np.timedelta64(int(rng.integers(0, 10**6)), "s"),
            kinds[rng.integers(0, 5)],
        )
        for _ in range(600)
    ]
    lo = _stages(funnel_stages(_events(rows).repartition(1), num_parts=1))
    hi = _stages(funnel_stages(_events(rows).repartition(11), num_parts=16))
    assert lo == hi
