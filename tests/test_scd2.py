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
