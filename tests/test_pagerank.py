"""PageRank: exact-integer damped iteration over the derived graph
(functions/pagerank.py) — reference-model equality, parallelism
invariance, mass bounds, and the dense-id guard."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from webscraper_ray.functions.dedup import md5_u64
from webscraper_ray.functions.pagerank import BASE, OUT_DEGREE, Q, pagerank


def _reference(n: int, iters: int) -> dict[int, int]:
    """Single-process model of the exact same integer iteration."""
    links = {
        u: [md5_u64(f"pr:{u}:{j}") % n for j in range(OUT_DEGREE)] for u in range(n)
    }
    r = {u: Q for u in range(n)}
    for _ in range(iters):
        sums = {u: 0 for u in range(n)}
        for u in range(n):
            c = r[u] // OUT_DEGREE
            for v in links[u]:
                sums[v] += c
        r = {u: BASE + (85 * sums[u]) // 100 for u in range(n)}
    return r


def _ids_ds(n: int) -> "ray.data.Dataset":
    return ray.data.from_arrow(
        pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64))})
    )


def test_matches_reference_model(ray_session):
    n, iters = 60, 4
    got = {
        row["doc_id"]: row["rank_q"]
        for row in pagerank(_ids_ds(n), n, iters=iters).take_all()
    }
    assert got == _reference(n, iters)


def test_parallelism_invariant(ray_session):
    n = 40
    a = pagerank(_ids_ds(n), n, iters=3, num_parts=2).take_all()
    b = pagerank(_ids_ds(n), n, iters=3, num_parts=11).take_all()
    key = lambda r: r["doc_id"]
    assert sorted(a, key=key) == sorted(b, key=key)


def test_mass_roughly_conserved(ray_session):
    # floors only ever LOSE mass; damping redistributes but the total
    # stays within a few percent of n*Q after a handful of rounds
    n = 50
    rows = pagerank(_ids_ds(n), n, iters=5).take_all()
    total = sum(r["rank_q"] for r in rows)
    assert 0.9 * n * Q < total <= n * Q
    assert all(r["rank_q"] >= BASE for r in rows)


def test_sparse_ids_rejected(ray_session):
    # ids 0..9 plus an out-of-range 100 with n_nodes=11: some message
    # targets an id that is not in the frontier
    ids = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(list(range(10)) + [100], pa.int64())})
    )
    with pytest.raises(Exception, match="dense"):
        pagerank(ids, 11, iters=1).take_all()


def test_empty_input(ray_session):
    out = pagerank(_ids_ds(0), 0, iters=3).take_all()
    assert out == []
