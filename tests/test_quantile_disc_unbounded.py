"""The iterative-refinement exact quantile_disc: multi-level refinement
(tiny cap + w0 forces >= 2 histogram levels), heavy-multiplicity
degenerate input, and agreement with a direct numpy rank selection."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from webscraper_ray.functions.stats import exact_quantile_disc_unbounded


def _numpy_disc(values: np.ndarray, fracs) -> list[tuple[float, float]]:
    s = np.sort(values)
    out = []
    for f in fracs:
        rank = max(1, math.ceil(f * len(s)))
        out.append((float(f), float(s[rank - 1])))
    return out


@pytest.mark.usefixtures("ray_session")
def test_multi_level_refinement_matches_numpy():
    rng = np.random.default_rng(7)
    vals = np.round(rng.uniform(0, 5000, size=20_000), 2)
    ds = ray.data.from_arrow(
        pa.table({"v": pa.array(vals, pa.float64())})
    ).repartition(8)
    fracs = [0.1, 0.5, 0.9, 0.99]
    # cap far below rows-per-bucket at w0 -> forces level-2 (and deeper)
    got = exact_quantile_disc_unbounded(
        ds, "v", fracs, w0=10_000, cap=50, shrink=100
    )
    assert got == _numpy_disc(vals, fracs)


@pytest.mark.usefixtures("ray_session")
def test_single_value_multiplicity_terminates():
    vals = np.full(5_000, 123.45)
    ds = ray.data.from_arrow(pa.table({"v": pa.array(vals, pa.float64())}))
    got = exact_quantile_disc_unbounded(ds, "v", [0.5], w0=100, cap=10)
    assert got == [(0.5, 123.45)]


@pytest.mark.usefixtures("ray_session")
def test_parallelism_invariance():
    rng = np.random.default_rng(11)
    vals = np.round(rng.exponential(800, size=8_000), 2)
    t = pa.table({"v": pa.array(vals, pa.float64())})
    a = exact_quantile_disc_unbounded(
        ray.data.from_arrow(t).repartition(2), "v", [0.25, 0.75], cap=100
    )
    b = exact_quantile_disc_unbounded(
        ray.data.from_arrow(t).repartition(13), "v", [0.25, 0.75], cap=100
    )
    assert a == b == _numpy_disc(vals, [0.25, 0.75])


@pytest.mark.usefixtures("ray_session")
def test_weighted_matches_repeat_expansion():
    """weight_col semantics = each row repeats weight times: the
    weighted answer must equal the unweighted answer over the expanded
    multiset, through multi-level refinement (tiny cap)."""
    rng = np.random.default_rng(19)
    vals = np.round(rng.uniform(0, 2000, size=6_000), 2)
    wts = rng.integers(1, 9, size=6_000)
    t = pa.table(
        {
            "v": pa.array(vals, pa.float64()),
            "w": pa.array(wts, pa.int64()),
        }
    )
    fracs = [0.1, 0.5, 0.9]
    got = exact_quantile_disc_unbounded(
        ray.data.from_arrow(t).repartition(7), "v", fracs, cap=60,
        weight_col="w",
    )
    expanded = np.repeat(vals, wts)
    assert got == _numpy_disc(expanded, fracs)


@pytest.mark.usefixtures("ray_session")
def test_weighted_rejects_bad_weights():
    t = pa.table({"v": pa.array([1.0, 2.0]), "w": pa.array([0, 3])})
    with pytest.raises(Exception, match="positive integers"):
        exact_quantile_disc_unbounded(
            ray.data.from_arrow(t), "v", [0.5], weight_col="w"
        )
    t2 = pa.table({"v": pa.array([1.0, 2.0]), "w": pa.array([1.5, 2.0])})
    with pytest.raises(Exception, match="positive integers"):
        exact_quantile_disc_unbounded(
            ray.data.from_arrow(t2), "v", [0.5], weight_col="w"
        )


def _numpy_grouped(groups: np.ndarray, vals: np.ndarray, fracs):
    out = []
    for g in sorted(set(groups.tolist())):
        sel = np.sort(vals[groups == g])
        for f in fracs:
            rank = max(1, math.ceil(f * len(sel)))
            out.append((g, float(f), float(sel[rank - 1])))
    out.sort(key=lambda x: (str(x[0]), x[1]))
    return out


@pytest.mark.usefixtures("ray_session")
def test_grouped_refinement_matches_numpy_and_is_invariant():
    from webscraper_ray.functions.stats import grouped_quantile_disc_unbounded

    rng = np.random.default_rng(3)
    groups = rng.choice(np.array(["a", "b", "c"], dtype=object), size=12_000)
    # skewed sizes + disjoint ranges per group so refinement paths differ
    vals = np.round(rng.uniform(0, 3000, size=12_000), 2)
    vals[groups == "b"] += 50_000.0
    t = pa.table(
        {"g": pa.array(groups, pa.string()), "v": pa.array(vals, pa.float64())}
    )
    fracs = [0.5, 0.9]
    want = _numpy_grouped(groups, vals, fracs)
    # tiny cap forces multi-level refinement in every group
    a = grouped_quantile_disc_unbounded(
        ray.data.from_arrow(t).repartition(3), "g", "v", fracs, cap=40
    )
    b = grouped_quantile_disc_unbounded(
        ray.data.from_arrow(t).repartition(11), "g", "v", fracs, cap=40
    )
    assert a == b == want


@pytest.mark.usefixtures("ray_session")
def test_grouped_refinement_guards():
    from webscraper_ray.functions.stats import grouped_quantile_disc_unbounded

    t = pa.table(
        {
            "g": pa.array([str(i) for i in range(40)], pa.string()),
            "v": pa.array(np.arange(40, dtype=np.float64)),
        }
    )
    ds = ray.data.from_arrow(t)
    with pytest.raises(ValueError, match="max_groups"):
        grouped_quantile_disc_unbounded(ds, "g", "v", [0.5], max_groups=10)
    neg = ray.data.from_arrow(
        pa.table({"g": pa.array(["x"] * 4), "v": pa.array([-1.0, 1, 2, 3])})
    )
    with pytest.raises(Exception, match="cent domain"):
        grouped_quantile_disc_unbounded(neg, "g", "v", [0.5])


@pytest.mark.usefixtures("ray_session")
def test_grouped_refinement_rejects_nondividing_width():
    """A level width that does not divide the group domain would let a
    bucket straddle group boundaries (review finding, reproduced as an
    IndexError / silent misattribution before the guard)."""
    from webscraper_ray.functions.stats import grouped_quantile_disc_unbounded

    t = pa.table(
        {
            "g": pa.array(["a", "b"] * 10, pa.string()),
            "v": pa.array(np.linspace(0.01, 100.0, 20)),
        }
    )
    with pytest.raises(ValueError, match="divide the group domain"):
        grouped_quantile_disc_unbounded(
            ray.data.from_arrow(t), "g", "v", [0.5], w0=7
        )


@pytest.mark.usefixtures("ray_session")
def test_grouped_weighted_matches_repeat_expansion():
    from webscraper_ray.functions.stats import grouped_quantile_disc_unbounded

    rng = np.random.default_rng(23)
    groups = rng.choice(np.array(["a", "b"], dtype=object), size=4_000)
    vals = np.round(rng.uniform(0, 1500, size=4_000), 2)
    wts = rng.integers(1, 7, size=4_000)
    t = pa.table(
        {
            "g": pa.array(groups, pa.string()),
            "v": pa.array(vals, pa.float64()),
            "w": pa.array(wts, pa.int64()),
        }
    )
    fracs = [0.25, 0.5, 0.9]
    got = grouped_quantile_disc_unbounded(
        ray.data.from_arrow(t).repartition(5), "g", "v", fracs, cap=50,
        weight_col="w",
    )
    want = _numpy_grouped(np.repeat(groups, wts), np.repeat(vals, wts), fracs)
    assert got == want
