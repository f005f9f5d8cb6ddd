"""k-core peeling: brute parity on a planted clique+tail graph, the
fixed-8-round == fixpoint pin on the oracle corpus shape."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _brute_kcore(pairs, k, iters=10**6):
    """Peel to fixpoint (or ``iters`` rounds) and return {node: deg}."""
    edges = {(a, b) for a, b in pairs} | {(b, a) for a, b in pairs}
    for _ in range(iters):
        deg = {}
        for a, _b in edges:
            deg[a] = deg.get(a, 0) + 1
        alive = {n for n, d in deg.items() if d >= k}
        nxt = {(a, b) for a, b in edges if a in alive and b in alive}
        if nxt == edges:
            break
        edges = nxt
    deg = {}
    for a, _b in edges:
        deg[a] = deg.get(a, 0) + 1
    return deg


def _run(pairs, k, iters=8):
    import ray.data

    from webscraper_ray.functions.dedup import _hash_distinct
    from webscraper_ray.functions.graph import kcore_members

    both = pairs + [(b, a) for a, b in pairs]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, _ in both], pa.int64()),
                "dst": pa.array([b for _, b in both], pa.int64()),
            }
        )
    )
    sym = _hash_distinct(ds, ["src", "dst"], 4)
    out = kcore_members(sym, k=k, iters=iters).to_pandas()
    return dict(zip(out["doc_id"].astype(int), out["deg"].astype(int)))


@pytest.mark.usefixtures("ray_session")
def test_kcore_planted_clique_and_tail():
    # 5-clique (ids 0-4, degree 4 each) + a pendant chain 4-10-11-12
    # + a triangle 20-21-22 (degree 2: peeled at k=3)
    clique = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    chain = [(4, 10), (10, 11), (11, 12)]
    tri = [(20, 21), (21, 22), (20, 22)]
    pairs = clique + chain + tri
    got = _run(pairs, k=3)
    exp = _brute_kcore(pairs, k=3)
    assert got == exp
    assert set(got) == set(range(5))  # only the clique survives
    assert all(d == 4 for d in got.values())


@pytest.mark.usefixtures("ray_session")
def test_kcore_fixed_rounds_reach_fixpoint_on_random_graph():
    # the oracle-corpus shape: out-degree-3 random digraph, symmetrized
    rng = np.random.default_rng(5)
    n = 200
    pairs = [
        (u, int(v))
        for u in range(n)
        for v in rng.integers(0, n, size=3)
        if u != v
    ]
    got = _run(pairs, k=3, iters=8)
    exp = _brute_kcore(pairs, k=3)
    assert got == exp  # 8 rounds suffice on this density (pin)
