"""Max-min fair budget water-filling (functions/waterfill.py):
progressive-filling reference equality, fairness invariants,
parallelism invariance, and the histogram-cardinality guard."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from webscraper_ray.functions.waterfill import budget_waterfill


def _reference(demands: dict[str, int], budget: int) -> dict[str, int]:
    """Progressive filling, one unit per round to the lowest-alloc
    unsaturated host, ties by (demand, source) — the definition."""
    hosts = sorted(demands, key=lambda s: (demands[s], s))
    alloc = {s: 0 for s in hosts}
    left = budget
    while left > 0:
        open_hosts = [s for s in hosts if alloc[s] < demands[s]]
        if not open_hosts:
            break
        low = min(alloc[s] for s in open_hosts)
        for s in open_hosts:
            if alloc[s] == low and left > 0:
                alloc[s] += 1
                left -= 1
    return alloc


def _rows(demands: dict[str, int]) -> pa.Table:
    src = []
    for s, d in demands.items():
        src.extend([s] * d)
    return pa.table({"source": pa.array(src, pa.string())})


def _run(demands: dict[str, int], budget: int, parts: int = 4) -> dict[str, int]:
    ds = ray.data.from_arrow(_rows(demands)).repartition(parts)
    out = budget_waterfill(ds, budget).take_all()
    assert all(r["demand"] == demands[r["source"]] for r in out)
    return {r["source"]: r["alloc"] for r in out}


DEMANDS = {"a": 9, "b": 1, "c": 4, "d": 4, "e": 2, "f": 12, "g": 4}


@pytest.mark.parametrize("budget", [0, 1, 5, 13, 17, 20, 35, 36, 50])
def test_matches_progressive_filling(ray_session, budget):
    assert _run(DEMANDS, budget) == _reference(DEMANDS, budget)


def test_fairness_invariants(ray_session):
    got = _run(DEMANDS, 17)
    total = sum(got.values())
    assert total == min(17, sum(DEMANDS.values()))
    assert all(got[s] <= DEMANDS[s] for s in DEMANDS)
    unsat = [got[s] for s in DEMANDS if got[s] < DEMANDS[s]]
    # all unsaturated hosts sit within one unit of the waterline
    assert max(unsat) - min(unsat) <= 1
    # no saturated host exceeds any unsaturated host's level + 1
    sat = [got[s] for s in DEMANDS if got[s] == DEMANDS[s]]
    assert all(a <= min(unsat) + 1 for a in sat)


def test_parallelism_invariant(ray_session):
    assert _run(DEMANDS, 13, parts=1) == _run(DEMANDS, 13, parts=9)


def test_residual_goes_to_smallest_sources(ray_session):
    # 4 hosts, same demand 5, budget 10 -> level 2, residual 2 to the
    # two lexicographically smallest
    demands = {"w": 5, "x": 5, "y": 5, "z": 5}
    got = _run(demands, 10)
    assert got == {"w": 3, "x": 3, "y": 2, "z": 2}


def test_histogram_guard_raises(ray_session):
    demands = {f"h{i:03d}": i + 1 for i in range(40)}
    ds = ray.data.from_arrow(_rows(demands))
    with pytest.raises(ValueError, match="distinct demand"):
        budget_waterfill(ds, 10, max_distinct=5)


def test_negative_budget_raises(ray_session):
    ds = ray.data.from_arrow(_rows({"a": 1}))
    with pytest.raises(ValueError, match="budget"):
        budget_waterfill(ds, -1)
