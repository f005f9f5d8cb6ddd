"""Connected components (duplicate-cluster resolution) — kernel,
convergence, parallelism invariance, full-corpus attach."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from webscraper_ray.functions.graph import (
    attach_cluster_ids,
    connected_components,
)


def _cc_dist(pairs, **kw):
    """Force the distributed label-propagation plan (gate off)."""
    return connected_components(pairs, small_gather_max=0, **kw)


def _pairs(pairs):
    a, b = zip(*pairs) if pairs else ((), ())
    return ray.data.from_arrow(
        pa.table(
            {"doc_a": pa.array(list(a), pa.int64()), "doc_b": pa.array(list(b), pa.int64())}
        )
    )


def _labels(ds):
    t = ds.to_pandas().sort_values("node")
    return dict(zip(t["node"], t["label"]))


def test_two_components_and_singleton_chain(ray_session):
    # component {1,2,3} (triangle), component {10,11,12,13} as a PATH —
    # diameter 3 exercises multiple propagation rounds
    got = _labels(
        _cc_dist(
            _pairs([(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (12, 13)]),
            num_parts=4,
        )
    )
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 13: 10}


def test_long_path_converges_in_diameter_rounds(ray_session):
    # path 0-1-2-...-9: worst-case diameter for 10 nodes
    got = _labels(
        _cc_dist(_pairs([(i, i + 1) for i in range(9)]), num_parts=3)
    )
    assert got == {i: 0 for i in range(10)}


def test_parallelism_invariance(ray_session):
    pairs = [(1, 5), (5, 9), (20, 21), (30, 31), (31, 32), (2, 9)]
    lo = _labels(_cc_dist(_pairs(pairs), num_parts=1))
    hi = _labels(_cc_dist(_pairs(pairs), num_parts=16))
    assert lo == hi == {1: 1, 5: 1, 9: 1, 2: 1, 20: 20, 21: 20, 30: 30, 31: 30, 32: 30}


def test_giant_star_single_round(ray_session):
    # the hot-band star shape the dedup caps emit: hub 0, 500 leaves
    got = _labels(
        _cc_dist(_pairs([(0, i) for i in range(1, 501)]), num_parts=8)
    )
    assert set(got.values()) == {0} and len(got) == 501


def test_empty_pairs(ray_session):
    out = connected_components(_pairs([]))
    assert out.count() == 0


def test_max_iters_guard(ray_session):
    with pytest.raises(RuntimeError, match="did not converge"):
        _cc_dist(_pairs([(i, i + 1) for i in range(9)]), max_iters=2)


def test_attach_cluster_ids_full_corpus(ray_session):
    comps = connected_components(_pairs([(3, 7), (7, 11)]), num_parts=4)
    docs = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(list(range(1, 13)), pa.int64())})
    )
    out = attach_cluster_ids(docs, comps, num_parts=4).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    want_cluster = [i if i not in (3, 7, 11) else 3 for i in range(1, 13)]
    assert out["cluster_id"].tolist() == want_cluster
    assert out["is_canonical"].tolist() == [
        1 if c == i else 0 for i, c in zip(range(1, 13), want_cluster)
    ]
    # exactly one canonical doc per cluster
    canon = out[out["is_canonical"] == 1]
    assert sorted(canon["doc_id"]) == sorted(set(want_cluster))


def test_attach_preserves_ids_above_2_53(ray_session):
    # a nullable int64 label column would round-trip through float64 and
    # corrupt ids above 2^53 — pin exact int64 fidelity end-to-end
    big = 2**53 + 1
    comps = connected_components(_pairs([(big, big + 2)]), num_parts=2)
    docs = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([big, big + 1, big + 2], pa.int64())})
    )
    out = (
        attach_cluster_ids(docs, comps, num_parts=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == [big, big + 1, big + 2]
    assert out["cluster_id"].tolist() == [big, big + 1, big]
    assert out["is_canonical"].tolist() == [1, 1, 0]

def test_small_gate_matches_distributed_plan(ray_session):
    """The union-find small-graph plan and the label-propagation plan
    must produce identical labels on a random graph."""
    rng = np.random.default_rng(5)
    pairs = sorted(
        {
            (int(min(x, y)), int(max(x, y)))
            for x, y in rng.integers(0, 60, (120, 2))
            if x != y
        }
    )
    small = _labels(connected_components(_pairs(pairs)))  # gated plan
    dist = _labels(_cc_dist(_pairs(pairs), num_parts=8))
    assert small == dist


# ---- pointer doubling (redirect-chain resolution) ----

from webscraper_ray.functions.graph import pointer_doubling


def _ptrs(pairs):
    n, x = zip(*pairs) if pairs else ((), ())
    return ray.data.from_arrow(
        pa.table(
            {"node": pa.array(list(n), pa.int64()), "next": pa.array(list(x), pa.int64())}
        )
    )


def _resolved(ds):
    df = ds.to_pandas().sort_values("node")
    return {int(r.node): (int(r.final), int(r.hops)) for r in df.itertuples()}


def test_pointer_doubling_chain_and_terminal(ray_session):
    # 4 -> 3 -> 2 -> 0 (terminal), 9 isolated terminal
    out = _resolved(pointer_doubling(_ptrs([(0, 0), (2, 0), (3, 2), (4, 3), (9, 9)])))
    assert out == {0: (0, 0), 2: (0, 1), 3: (0, 2), 4: (0, 3), 9: (9, 0)}


def test_pointer_doubling_log_rounds(ray_session):
    # a 40-long chain converges within ceil(log2(40)) + 1 = 7 rounds
    ptrs = [(0, 0)] + [(i, i - 1) for i in range(1, 41)]
    out = _resolved(pointer_doubling(_ptrs(ptrs), max_rounds=7))
    assert out[40] == (0, 40) and out[1] == (0, 1)


def test_pointer_doubling_parallelism_invariance(ray_session):
    ptrs = [(i, i if i % 8 == 0 else i - 1) for i in range(64)]
    a = _resolved(pointer_doubling(_ptrs(ptrs), num_parts=2))
    b = _resolved(pointer_doubling(_ptrs(ptrs), num_parts=13))
    assert a == b


def test_pointer_doubling_cycle_trips_guard(ray_session):
    with pytest.raises(RuntimeError, match="converge"):
        pointer_doubling(_ptrs([(1, 2), (2, 1)]), max_rounds=5).count()


def test_pointer_doubling_missing_node_raises(ray_session):
    with pytest.raises(Exception, match="missing node"):
        pointer_doubling(_ptrs([(5, 4)])).count()


def test_pointer_doubling_empty(ray_session):
    out = pointer_doubling(_ptrs([]))
    assert out.count() == 0
    assert set(out.schema().names) == {"node", "final", "hops"}
