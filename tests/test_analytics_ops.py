"""Edge-case units for the analytics window/set ops added in round 4:
exact ntile sizing at every n mod k, the pinned-taxonomy guard, and
cohort week bucketing."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

import ray.data


def test_ntile_matches_sql_for_every_group_size(ray_session, tmp_path):
    # one nation per size 1..9 exercises every n % 4 branch
    rows = []
    key = 0
    for nation, size in enumerate([1, 2, 3, 4, 5, 6, 7, 8, 9]):
        for i in range(size):
            rows.append((key, nation, float(1000 - i)))
            key += 1
    t = pa.table(
        {
            "c_custkey": pa.array([r[0] for r in rows], pa.int64()),
            "c_nationkey": pa.array([r[1] for r in rows], pa.int32()),
            "c_acctbal": pa.array([r[2] for r in rows], pa.float64()),
            "c_name": pa.array([""] * len(rows), pa.string()),
            "c_mktsegment": pa.array([""] * len(rows), pa.string()),
        }
    )
    import pyarrow.parquet as pq

    pq.write_table(t, tmp_path / "customer.parquet")

    from webscraper_ray.queries import QUERIES

    mine = QUERIES["ntile_customers"](str(tmp_path)).to_pandas()
    con = duckdb.connect()
    want = con.execute(
        "SELECT c_custkey, c_nationkey, ntile(4) OVER ("
        "PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS tile "
        f"FROM read_parquet('{tmp_path}/customer.parquet')"
    ).df()
    m = mine.sort_values("c_custkey").reset_index(drop=True)
    w = want.sort_values("c_custkey").reset_index(drop=True)
    assert list(m["tile"]) == list(w["tile"])


def test_event_type_overlap_rejects_unknown_type(ray_session, tmp_path):
    import pyarrow.parquet as pq

    t = pa.table(
        {
            "event_id": pa.array([1], pa.int64()),
            "ts": pa.array([0], pa.timestamp("us")),
            "user_id": pa.array([1], pa.int64()),
            "event_type": pa.array(["mystery"], pa.string()),
            "value": pa.array([0.0], pa.float64()),
            "props": pa.array(["{}"], pa.string()),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    from webscraper_ray.queries import QUERIES

    with pytest.raises(Exception, match="unknown event_type"):
        QUERIES["event_type_overlap"](str(tmp_path)).take_all()


def test_cohort_week_is_epoch_bucket(ray_session, tmp_path):
    import pyarrow.parquet as pq

    us = 1_000_000
    week = 7 * 86_400 * us
    # user 1 first active in week 0, returns week 2; user 2 only week 2
    t = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array([10 * us, 2 * week + us, 2 * week + 5 * us]).cast(
                pa.timestamp("us")
            ),
            "user_id": pa.array([1, 1, 2], pa.int64()),
            "event_type": pa.array(["view"] * 3, pa.string()),
            "value": pa.array([0.0] * 3, pa.float64()),
            "props": pa.array(["{}"] * 3, pa.string()),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    from webscraper_ray.queries import QUERIES

    rows = QUERIES["cohort_retention"](str(tmp_path)).take_all()
    got = {(r["cohort_week"], r["active_week"]): r["n_users"] for r in rows}
    assert got == {(0, 0): 1, (0, 2): 1, (2, 2): 1}
