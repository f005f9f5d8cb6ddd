"""paragraph_dedup_stats (functions/paradedup.py): hand-computed
keep-first winners, within-doc repeats, empty text, parallelism
invariance, and the PID_LIMIT guard."""

import pyarrow as pa
import pytest

import ray.data

from webscraper_ray.functions.paradedup import (
    PARA_WORDS,
    PID_LIMIT,
    paragraph_dedup_stats,
)


def _ds(texts: list[str], ids=None, blocks=1) -> "ray.data.Dataset":
    t = pa.table(
        {
            "doc_id": pa.array(ids or range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    ds = ray.data.from_arrow(t)
    return ds.repartition(blocks) if blocks > 1 else ds


def _run(texts, **kw):
    rows = paragraph_dedup_stats(_ds(texts, **kw)).take_all()
    return {
        r["doc_id"]: (r["n_paras"], r["n_kept"], r["kept_chars"])
        for r in rows
    }


def _para(tag: str) -> str:
    """One full 12-word paragraph, unique per tag."""
    return " ".join([tag] * PARA_WORDS)


def test_keep_first_across_docs(ray_session):
    shared, solo = _para("dup"), _para("own")
    # doc0 holds the first occurrence; doc1 repeats it and adds its own
    got = _run([shared, shared + " " + solo])
    assert got[0] == (1, 1, len(shared))
    assert got[1] == (2, 1, len(solo))


def test_within_doc_repeat_keeps_first_pid(ray_session):
    p = _para("x")
    got = _run([p + " " + p])
    # pid 0 wins, pid 1 dropped
    assert got[0] == (2, 1, len(p))


def test_short_and_empty_docs(ray_session):
    # "" splits to one empty word -> one empty paragraph of length 0;
    # a 3-word doc is a single short paragraph
    got = _run(["", "a b c", ""])
    assert got[0] == (1, 1, 0)
    assert got[1] == (1, 1, 5)
    assert got[2] == (1, 0, 0)  # empty paragraph already seen in doc0


def test_lower_doc_id_wins_regardless_of_row_order(ray_session):
    p = _para("w")
    got = {
        r["doc_id"]: r["n_kept"]
        for r in paragraph_dedup_stats(
            _ds([p, p], ids=[7, 3])
        ).take_all()
    }
    assert got == {3: 1, 7: 0}


def test_parallelism_invariance(ray_session):
    texts = [
        " ".join(f"w{(i * 7 + j) % 5}" for j in range(30)) for i in range(40)
    ]
    a = _run(texts)
    b = {
        r["doc_id"]: (r["n_paras"], r["n_kept"], r["kept_chars"])
        for r in paragraph_dedup_stats(
            _ds(texts, blocks=8), num_parts=3
        ).take_all()
    }
    assert a == b


def test_pid_limit_guard(ray_session):
    import ray.exceptions

    monster = " ".join(["w"] * (PID_LIMIT * PARA_WORDS + 1))
    with pytest.raises(
        (ValueError, ray.exceptions.RayTaskError), match="PID_LIMIT"
    ):
        paragraph_dedup_stats(_ds([monster])).take_all()
