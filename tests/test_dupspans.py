"""dup_span_stats (functions/dupspans.py): hand-computed corpus,
zero-fill for sub-n docs, parallelism invariance."""

import pyarrow as pa

import ray.data

from webscraper_ray.functions.dupspans import dup_span_stats


def _ds(texts: list[str]) -> "ray.data.Dataset":
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )


def _run(texts, **kw):
    rows = dup_span_stats(_ds(texts), n=3, **kw).take_all()
    return {r["doc_id"]: (r["n_grams"], r["n_dup_grams"]) for r in rows}


def test_hand_computed(ray_session):
    # doc0 and doc1 share exactly the gram "b c d"; doc2 is disjoint
    got = _run(["a b c d", "x b c d", "p q r s t"])
    # doc0 grams: {a b c, b c d}; doc1: {x b c, b c d};
    # doc2: {p q r, q r s, r s t}
    assert got == {0: (2, 1), 1: (2, 1), 2: (3, 0)}


def test_within_doc_repeat_counts_once(ray_session):
    # doc0 "a b c a b c a b c": 7 gram starts but only 3 DISTINCT grams,
    # none shared with doc1; doc1 "z z z z": both starts give "z z z"
    got = _run(["a b c a b c a b c", "z z z z"])
    assert got == {0: (3, 0), 1: (1, 0)}


def test_short_and_empty_docs_zero_filled(ray_session):
    got = _run(["one two", "", "   ", "a b c"])
    assert got == {0: (0, 0), 1: (0, 0), 2: (0, 0), 3: (1, 0)}


def test_parallelism_invariant(ray_session):
    texts = [f"tok{i} tok{i + 1} tok{i + 2} tok{i + 3}" for i in range(30)]
    a = _run(texts, num_parts=2)
    b = _run(texts, num_parts=13)
    assert a == b
