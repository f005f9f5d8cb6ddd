"""HITS hubs & authorities: exact-integer max-rescale iteration over
the derived graph (functions/hits.py) — reference-model equality,
parallelism invariance, score bounds, and the degenerate-input edges."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from webscraper_ray.functions.dedup import md5_u64
from webscraper_ray.functions.hits import OUT_DEGREE, Q, hits


def _reference(n: int, iters: int) -> dict[int, tuple[int, int]]:
    """Single-process model of the identical integer iteration."""
    links = {
        u: [md5_u64(f"hits:{u}:{j}") % n for j in range(OUT_DEGREE)]
        for u in range(n)
    }
    h = {u: Q for u in range(n)}
    a = {u: 0 for u in range(n)}
    for _ in range(iters):
        a = {u: 0 for u in range(n)}
        for u in range(n):
            for v in links[u]:
                a[v] += h[u]
        ma = max(a.values())
        a = {u: (a[u] * Q) // ma for u in range(n)}
        h = {u: sum(a[v] for v in links[u]) for u in range(n)}
        mh = max(h.values())
        h = {u: (h[u] * Q) // mh for u in range(n)}
    return {u: (h[u], a[u]) for u in range(n)}


def _run(n: int, iters: int, num_parts: int) -> dict[int, tuple[int, int]]:
    ids = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64))})
    )
    rows = hits(ids, n, iters=iters, num_parts=num_parts).take_all()
    return {r["doc_id"]: (r["hub_q"], r["auth_q"]) for r in rows}


def test_matches_reference_model(ray_session):
    n, iters = 120, 3
    assert _run(n, iters, num_parts=8) == _reference(n, iters)


def test_parallelism_invariant(ray_session):
    n, iters = 90, 2
    assert _run(n, iters, num_parts=2) == _run(n, iters, num_parts=13)


def test_scores_bounded_and_max_hit(ray_session):
    got = _run(100, 2, num_parts=4)
    hubs = [v[0] for v in got.values()]
    auths = [v[1] for v in got.values()]
    assert all(0 <= x <= Q for x in hubs + auths)
    # the rescale pins the per-half-step max at exactly Q
    assert max(hubs) == Q
    assert max(auths) == Q


def test_empty_graph(ray_session):
    ids = ray.data.from_arrow(pa.table({"doc_id": pa.array([], pa.int64())}))
    out = hits(ids, 0, iters=2)
    assert out.count() == 0
    assert set(out.schema().names) == {"doc_id", "hub_q", "auth_q"}


def test_single_node_self_loops(ray_session):
    got = _run(1, 2, num_parts=3)
    # the one node is both the best hub and the best authority
    assert got == {0: (Q, Q)}
