"""grid_radius_join (functions/spatial.py): brute-force parity on a
random-ish lattice, boundary inclusivity, exactly-once emission,
parallelism invariance."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from webscraper_ray.functions.spatial import grid_radius_join


def _pts(xy, blocks=1):
    ids = list(range(len(xy)))
    t = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "x": pa.array([p[0] for p in xy], pa.int64()),
            "y": pa.array([p[1] for p in xy], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t)
    return ds.repartition(blocks) if blocks > 1 else ds


def _brute(xy, r):
    out = set()
    for a in range(len(xy)):
        for b in range(a + 1, len(xy)):
            if abs(xy[a][0] - xy[b][0]) <= r and abs(xy[a][1] - xy[b][1]) <= r:
                out.add((a, b))
    return out


def _run(xy, r, **kw):
    rows = grid_radius_join(_pts(xy, **kw), radius=r).take_all()
    pairs = [(row["a"], row["b"]) for row in rows]
    assert len(pairs) == len(set(pairs)), "pair emitted more than once"
    return set(pairs)


def test_brute_force_parity(ray_session):
    rng = np.random.RandomState(7)
    xy = [(int(a), int(b)) for a, b in rng.randint(0, 60, size=(80, 2))]
    assert _run(xy, 10) == _brute(xy, 10)


def test_boundary_inclusive_and_cell_edges(ray_session):
    # exactly r apart straddling a cell border, and r+1 apart (excluded)
    xy = [(0, 0), (5, 0), (6, 0), (0, 5), (11, 0)]
    got = _run(xy, 5)
    assert (0, 1) in got and (0, 3) in got
    assert (0, 2) not in got  # dx = 6 > r
    assert (1, 4) not in got  # dx = 11 - 5 = 6 > r
    assert (2, 4) in got  # dx = 11 - 6 = 5 == r, inclusive


def test_parallelism_invariance(ray_session):
    rng = np.random.RandomState(3)
    xy = [(int(a), int(b)) for a, b in rng.randint(0, 200, size=(150, 2))]
    assert _run(xy, 15) == _run(xy, 15, blocks=7)


def test_invalid_radius(ray_session):
    with pytest.raises(ValueError):
        grid_radius_join(_pts([(0, 0)]), radius=0)
