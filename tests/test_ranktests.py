"""Two-sample rank statistics: brute parity (tie-aware), overflow and
bucket-gather guards, cross-bucket-boundary correctness."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _brute(a: np.ndarray, b: np.ndarray):
    """Direct tie-aware KS numerator / 2*ranksum on small samples."""
    vals = np.unique(np.concatenate([a, b]))
    n1, n2 = len(a), len(b)
    s1 = np.array([(a <= v).sum() for v in vals], dtype=np.int64)
    s2 = np.array([(b <= v).sum() for v in vals], dtype=np.int64)
    ks_num = int(np.abs(s1 * n2 - s2 * n1).max()) if len(vals) else 0
    pooled = np.sort(np.concatenate([a, b]))
    # tie-averaged ranks of sample a within pooled, x2 to stay integral
    u2 = 0
    for x in a:
        below = int((pooled < x).sum())
        cnt = int((pooled == x).sum())
        u2 += 2 * below + cnt + 1
    return n1, n2, ks_num, u2


def _run(a, b, **kw):
    import ray.data

    from webscraper_ray.functions.ranktests import two_sample_rank_stats

    v = np.concatenate([a, b]).astype(np.int64)
    c1 = np.r_[np.ones(len(a), np.int64), np.zeros(len(b), np.int64)]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "v": pa.array(v, pa.int64()),
                "c1": pa.array(c1, pa.int64()),
                "c2": pa.array(1 - c1, pa.int64()),
            }
        )
    ).repartition(4)
    return two_sample_rank_stats(ds, **kw).to_pandas().iloc[0]


@pytest.mark.usefixtures("ray_session")
def test_rank_stats_match_bruteforce_with_ties():
    rng = np.random.default_rng(11)
    # values straddle several 2^16 buckets and contain heavy ties
    a = rng.integers(0, 300_000, size=200)
    b = rng.integers(50_000, 350_000, size=150)
    a[:40] = 65_536  # planted tie pile exactly on a bucket boundary
    b[:25] = 65_536
    row = _run(a, b)
    n1, n2, ks_num, u2 = _brute(a, b)
    assert (row["n1"], row["n2"]) == (n1, n2)
    assert row["ks_num"] == ks_num
    assert row["u2"] == u2
    assert row["ks_d"] == round(ks_num / (n1 * n2), 6)


@pytest.mark.usefixtures("ray_session")
def test_rank_stats_guards():
    from webscraper_ray.functions.ranktests import two_sample_rank_stats

    import ray.data

    ds = ray.data.from_arrow(
        pa.table(
            {
                "v": pa.array(np.arange(100, dtype=np.int64) * 1_000_000),
                "c1": pa.array(np.ones(100, np.int64)),
                "c2": pa.array(np.zeros(100, np.int64)),
            }
        )
    )
    with pytest.raises(ValueError, match="value buckets"):
        two_sample_rank_stats(ds, bucket_w=1, max_buckets=10)


@pytest.mark.usefixtures("ray_session")
def test_rank_stats_identical_samples_are_null():
    a = np.array([5, 5, 10, 20], dtype=np.int64)
    row = _run(a, a)
    assert row["ks_num"] == 0 and row["ks_d"] == 0.0
    # identical samples: U1 = n1*n2/2 -> 2*R1 = n1*n2 + n1*(n1+1)
    n1 = len(a)
    assert row["u2"] == n1 * n1 + n1 * (n1 + 1)
