"""SCD type-2 dimension build (windows.scd2_versions) — change
detection, version numbering, validity chaining, partition invariance."""

import numpy as np
import pyarrow as pa

import ray.data

from webscraper_ray.functions.windows import scd2_versions


def _events(rows):
    eid, uid, ts, et = zip(*rows)
    return ray.data.from_arrow(
        pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "user_id": pa.array(uid, pa.int64()),
                "ts": pa.array(
                    np.array(ts, dtype="datetime64[us]"), pa.timestamp("us")
                ),
                "event_type": pa.array(et, pa.string()),
            }
        )
    )


def _us(s):
    return np.datetime64(s, "us").astype(np.int64)


def test_scd2_hand_case(ray_session):
    rows = [
        # user 1: click -> click (collapsed) -> buy -> click
        (1, 1, "2024-01-01T00:00", "click"),
        (2, 1, "2024-01-01T00:10", "click"),
        (3, 1, "2024-01-01T00:20", "buy"),
        (4, 1, "2024-01-01T00:30", "click"),
        # user 2: one state only
        (5, 2, "2024-01-01T01:00", "view"),
        (6, 2, "2024-01-01T02:00", "view"),
    ]
    df = (
        scd2_versions(_events(rows))
        .to_pandas()
        .sort_values(["user_id", "version"])
        .reset_index(drop=True)
    )
    got = [
        (
            int(r.user_id),
            int(r.version),
            r.event_type,
            int(r.valid_from_us),
            None if np.isnan(r.valid_to_us) else int(r.valid_to_us),
        )
        for r in df.itertuples()
    ]
    assert got == [
        (1, 1, "click", _us("2024-01-01T00:00"), _us("2024-01-01T00:20")),
        (1, 2, "buy", _us("2024-01-01T00:20"), _us("2024-01-01T00:30")),
        (1, 3, "click", _us("2024-01-01T00:30"), None),
        (2, 1, "view", _us("2024-01-01T01:00"), None),
    ]


def test_scd2_tie_breaks_on_event_id_and_is_partition_invariant(ray_session):
    # two simultaneous events: event_id orders them, so the change
    # click->buy happens (not buy->click)
    rows = [
        (10, 7, "2024-01-01T00:00", "click"),
        (11, 7, "2024-01-01T00:00", "buy"),
    ]
    df = scd2_versions(_events(rows)).to_pandas().sort_values("version")
    assert list(df["event_type"]) == ["click", "buy"]

    # same data through 1 partition and 16 partitions: identical rows
    many = [
        (i, i % 5, f"2024-01-01T00:{i % 60:02d}", ["a", "b", "a"][i % 3])
        for i in range(200)
    ]
    a = (
        scd2_versions(_events(many), num_parts=1)
        .to_pandas()
        .sort_values(["user_id", "version"])
        .reset_index(drop=True)
    )
    b = (
        scd2_versions(_events(many), num_parts=16)
        .to_pandas()
        .sort_values(["user_id", "version"])
        .reset_index(drop=True)
    )
    assert a.equals(b)


# ---- multi-touch attribution (windows.multitouch_credits) ----

def _mt_events(rows):
    from webscraper_ray.functions.windows import multitouch_credits  # noqa: F401

    eid, uid, ts, et = zip(*rows)
    return ray.data.from_arrow(
        pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "user_id": pa.array(uid, pa.int64()),
                "ts": pa.array(
                    np.array(ts, dtype="datetime64[us]"), pa.timestamp("us")
                ),
                "event_type": pa.array(et, pa.string()),
            }
        )
    )


def test_multitouch_hand_credits(ray_session):
    from webscraper_ray.functions.windows import multitouch_credits

    rows = [
        # user 1: 5 clicks then a purchase -> U-shape over k=5:
        # first 4000, last 4000, middles 2000//3=666 each, +2 to pos 2
        (1, 1, "2024-01-01T00:00", "click"),
        (2, 1, "2024-01-01T00:01", "click"),
        (3, 1, "2024-01-01T00:02", "click"),
        (4, 1, "2024-01-01T00:03", "click"),
        (5, 1, "2024-01-01T00:04", "click"),
        (6, 1, "2024-01-01T00:05", "purchase"),
        # user 2: single click takes all 10000; click AT purchase ts excluded
        (7, 2, "2024-01-01T00:00", "click"),
        (8, 2, "2024-01-01T00:05", "click"),  # == purchase ts -> excluded
        (9, 2, "2024-01-01T00:05", "purchase"),
        # user 3: click outside the 7-day window gets nothing
        (10, 3, "2024-01-01T00:00", "click"),
        (11, 3, "2024-01-20T00:00", "purchase"),
    ]
    df = multitouch_credits(_mt_events(rows)).to_pandas()
    got = dict(zip(df["event_id"], df["credit_bp"]))
    assert got == {1: 4000, 2: 666 + 2, 3: 666, 4: 666, 5: 4000, 7: 10000}
    # total credit of user 1's purchase is exactly 10000 bp
    assert sum(v for k, v in got.items() if k <= 5) == 10000


def test_multitouch_click_serves_two_purchases(ray_session):
    from webscraper_ray.functions.windows import multitouch_credits

    rows = [
        (1, 1, "2024-01-01T00:00", "click"),
        (2, 1, "2024-01-01T00:01", "purchase"),  # k=1 -> 10000
        (3, 1, "2024-01-01T00:02", "click"),
        (4, 1, "2024-01-01T00:03", "purchase"),  # k=2 -> 5000 each
    ]
    df = multitouch_credits(_mt_events(rows)).to_pandas()
    got = dict(zip(df["event_id"], df["credit_bp"]))
    assert got == {1: 10000 + 5000, 3: 5000}
