"""snapshot_diff (functions/cdc.py): classification, unchanged rows
dropped, duplicate-id guard, parallelism invariance."""

import pyarrow as pa
import pytest

import ray.data

from webscraper_ray.functions.cdc import snapshot_diff


def _ds(rows: dict[int, str]) -> "ray.data.Dataset":
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(rows), pa.int64()),
                "text": pa.array(list(rows.values()), pa.string()),
            }
        )
    )


def _diff(old, new, **kw):
    rows = snapshot_diff(_ds(old), _ds(new), **kw).take_all()
    return {r["doc_id"]: r["change"] for r in rows}


def test_classification(ray_session):
    old = {1: "a", 2: "b", 3: "c", 4: "d"}
    new = {2: "b", 3: "c CHANGED", 4: "d", 5: "e"}
    assert _diff(old, new) == {1: "deleted", 3: "modified", 5: "added"}


def test_all_unchanged_is_empty(ray_session):
    rows = {i: f"t{i}" for i in range(20)}
    assert _diff(rows, dict(rows)) == {}


def test_none_vs_empty_text(ray_session):
    # both sides hash None as "" — a None->"" flip is NOT a change
    old = _ds({1: "x"})
    new = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1], pa.int64()),
                "text": pa.array([None], pa.string()),
            }
        )
    )
    got = snapshot_diff(old, new).take_all()
    assert {r["doc_id"]: r["change"] for r in got} == {1: "modified"}


def test_duplicate_id_rejected(ray_session):
    old = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 1], pa.int64()),
                "text": pa.array(["a", "b"], pa.string()),
            }
        )
    )
    with pytest.raises(Exception, match="unique ids"):
        snapshot_diff(old, _ds({1: "a"})).take_all()


def test_parallelism_invariant(ray_session):
    old = {i: f"v{i}" for i in range(50)}
    new = {i: (f"v{i}" if i % 3 else f"w{i}") for i in range(5, 55)}
    a = _diff(old, new, num_parts=2)
    b = _diff(old, new, num_parts=9)
    assert a == b
