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
