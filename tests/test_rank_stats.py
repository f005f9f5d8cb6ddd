"""rank_weighted_sum_cents: the distributed rank-weighted moment under
tie skew and arbitrary partitioning, vs a brute-force numpy oracle."""

import numpy as np
import pyarrow as pa
import pytest

import ray


def _brute(vals: np.ndarray) -> tuple[int, int, int]:
    c = np.floor(vals * 100.0 + 0.5).astype(np.int64)
    s = np.sort(c)
    n = len(s)
    sv = int(s.sum())
    siv = sum(int(v) * (i + 1) for i, v in enumerate(s.tolist()))
    return n, sv, siv


@pytest.mark.usefixtures("ray_session")
def test_matches_brute_and_parallelism_invariant():
    from webscraper_ray.functions.stats import rank_weighted_sum_cents

    rng = np.random.default_rng(7)
    vals = np.round(rng.uniform(0, 5000, size=9_000), 2)
    t = pa.table({"v": pa.array(vals, pa.float64())})
    want = _brute(vals)
    a = rank_weighted_sum_cents(
        ray.data.from_arrow(t).repartition(3), "v", bucket_w=100
    )
    b = rank_weighted_sum_cents(
        ray.data.from_arrow(t).repartition(17), "v", bucket_w=1_000
    )
    assert a == b == want


@pytest.mark.usefixtures("ray_session")
def test_tie_skew_one_hot_value():
    """One value holding most rows (whole bucket = one partition) must
    degrade gracefully and stay exact — sum i*v is tie-invariant."""
    from webscraper_ray.functions.stats import rank_weighted_sum_cents

    vals = np.concatenate(
        [np.full(5_000, 42.5), np.array([1.0, 2.0, 99.99, 100.01])]
    )
    t = pa.table({"v": pa.array(vals, pa.float64())})
    got = rank_weighted_sum_cents(ray.data.from_arrow(t).repartition(5), "v")
    assert got == _brute(vals)


@pytest.mark.usefixtures("ray_session")
def test_bucket_guard_and_empty():
    from webscraper_ray.functions.stats import rank_weighted_sum_cents

    t = pa.table({"v": pa.array(np.arange(100, dtype=np.float64))})
    with pytest.raises(ValueError, match="max_buckets"):
        rank_weighted_sum_cents(
            ray.data.from_arrow(t), "v", bucket_w=1, max_buckets=10
        )
    with pytest.raises(Exception, match="negative"):
        rank_weighted_sum_cents(
            ray.data.from_arrow(pa.table({"v": pa.array([-1.0, 2.0])})), "v"
        )


@pytest.mark.usefixtures("ray_session")
def test_dense_topk_cover_under_adversarial_batching():
    """A globally-top-3 value hidden in batches full of larger values
    must keep its exact count (the batch-local-top-3 cover argument)."""
    from webscraper_ray.queries import QUERIES

    import duckdb
    import os
    import tempfile

    rng = np.random.default_rng(11)
    # group 'A': value 10.00 appears 40x scattered among larger 11..13s
    pri = ["A"] * 400
    vals = np.concatenate(
        [np.full(40, 10.0), np.round(rng.uniform(11, 13, 360), 2)]
    )
    rng.shuffle(vals)
    with tempfile.TemporaryDirectory() as d:
        import pyarrow.parquet as pq

        pq.write_table(
            pa.table(
                {
                    "o_orderpriority": pa.array(pri, pa.string()),
                    "o_totalprice": pa.array(vals, pa.float64()),
                }
            ),
            os.path.join(d, "orders.parquet"),
        )
        got = (
            QUERIES["dense_topk_prices"](d)
            .to_pandas()
            .sort_values(["o_orderpriority", "o_totalprice"])
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW orders AS SELECT * FROM "
            f"read_parquet('{os.path.join(d, 'orders.parquet')}')"
        )
        want = (
            con.execute(
                """SELECT o_orderpriority, o_totalprice, count(*) AS n
                   FROM orders GROUP BY 1, 2
                   QUALIFY dense_rank() OVER (PARTITION BY o_orderpriority
                     ORDER BY o_totalprice DESC) <= 3
                   ORDER BY 1, 2"""
            )
            .fetchdf()
            .reset_index(drop=True)
        )
        import pandas as pd

        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def _brute_grouped(groups: np.ndarray, vals: np.ndarray):
    out = []
    for g in sorted(set(groups.tolist())):
        n, sv, siv = _brute(vals[groups == g])
        out.append((g, n, sv, siv))
    return out


@pytest.mark.usefixtures("ray_session")
def test_grouped_matches_brute_and_is_invariant():
    from webscraper_ray.functions.stats import grouped_rank_weighted_sum_cents

    rng = np.random.default_rng(23)
    groups = rng.choice(np.array(["a", "b", "c"], dtype=object), size=8_000)
    vals = np.round(rng.uniform(0, 4000, size=8_000), 2)
    vals[groups == "b"] += 70_000.0  # disjoint ranges stress the prefix math
    t = pa.table(
        {"g": pa.array(groups, pa.string()), "v": pa.array(vals, pa.float64())}
    )
    want = _brute_grouped(groups, vals)
    a = grouped_rank_weighted_sum_cents(
        ray.data.from_arrow(t).repartition(3), "g", "v", bucket_w=100
    )
    b = grouped_rank_weighted_sum_cents(
        ray.data.from_arrow(t).repartition(13), "g", "v", bucket_w=10_000
    )
    assert a == b == want


@pytest.mark.usefixtures("ray_session")
def test_grouped_guards():
    from webscraper_ray.functions.stats import grouped_rank_weighted_sum_cents

    t = pa.table(
        {
            "g": pa.array([str(i) for i in range(30)], pa.string()),
            "v": pa.array(np.arange(30, dtype=np.float64)),
        }
    )
    with pytest.raises(ValueError, match="max_groups"):
        grouped_rank_weighted_sum_cents(
            ray.data.from_arrow(t), "g", "v", max_groups=5
        )
    with pytest.raises(ValueError, match="divide the group domain"):
        grouped_rank_weighted_sum_cents(
            ray.data.from_arrow(t), "g", "v", bucket_w=7
        )
    neg = ray.data.from_arrow(
        pa.table({"g": pa.array(["x"] * 3), "v": pa.array([-0.5, 1.0, 2.0])})
    )
    with pytest.raises(Exception, match="cent domain"):
        grouped_rank_weighted_sum_cents(neg, "g", "v")
