"""Batch perceptron (functions/linear.py): single-process reference
equality, parallelism invariance, learning-signal sanity on the
realizable derived labels, and the headroom guard."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from webscraper_ray.functions.linear import SCALE, perceptron_train


def _make(n: int, d: int, seed: int = 7):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, d)).astype(np.float32)
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(list(x), pa.list_(pa.float32())),
        }
    )


def _reference(tbl: pa.Table, d: int, iters: int, label_dims: int) -> np.ndarray:
    x = np.asarray(
        tbl.column("embedding").combine_chunks().values, dtype=np.float64
    ).reshape(-1, d)
    q = np.where(
        x * SCALE >= 0, np.floor(x * SCALE + 0.5), np.ceil(x * SCALE - 0.5)
    ).astype(np.int64)
    y = np.where(q[:, :label_dims].sum(axis=1) > 0, 1, -1).astype(np.int64)
    w = np.zeros(d, dtype=np.int64)
    for _ in range(iters):
        mis = y * (q @ w) <= 0
        w = w + (q[mis] * y[mis, None]).sum(axis=0, dtype=np.int64)
    return w


def test_matches_reference_model(ray_session):
    tbl = _make(200, 16)
    ds = ray.data.from_arrow(tbl)
    out = perceptron_train(ds, d=16, iters=3, label_dims=4)
    got = np.zeros(16, dtype=np.int64)
    for dim, wt in zip(out.column("dim").to_pylist(), out.column("weight").to_pylist()):
        got[dim - 1] = wt
    assert np.array_equal(got, _reference(tbl, 16, 3, 4))


def test_parallelism_invariant(ray_session):
    tbl = _make(300, 8, seed=3)
    a = perceptron_train(
        ray.data.from_arrow(tbl).repartition(1), d=8, iters=2, label_dims=3
    )
    b = perceptron_train(
        ray.data.from_arrow(tbl).repartition(11), d=8, iters=2, label_dims=3
    )
    assert a.equals(b)


def test_learns_the_separable_target(ray_session):
    """On the realizable target the trained model must beat chance by a
    wide margin (the separator is sum of the first label_dims dims)."""
    tbl = _make(400, 12, seed=5)
    out = perceptron_train(
        ray.data.from_arrow(tbl), d=12, iters=5, label_dims=4
    )
    w = np.array(out.column("weight").to_pylist(), dtype=np.int64)
    x = np.asarray(
        tbl.column("embedding").combine_chunks().values, dtype=np.float64
    ).reshape(-1, 12)
    q = np.where(
        x * SCALE >= 0, np.floor(x * SCALE + 0.5), np.ceil(x * SCALE - 0.5)
    ).astype(np.int64)
    y = np.where(q[:, :4].sum(axis=1) > 0, 1, -1)
    pred = np.where(q @ w > 0, 1, -1)
    assert (pred == y).mean() > 0.9


def test_headroom_guard_raises(ray_session):
    tbl = _make(50, 4, seed=1)
    ds = ray.data.from_arrow(tbl)
    import webscraper_ray.functions.linear as lin

    old = lin._GUARD
    lin._GUARD = 1  # force the guard
    try:
        with pytest.raises(ValueError, match="headroom"):
            perceptron_train(ds, d=4, iters=1, label_dims=2)
    finally:
        lin._GUARD = old
