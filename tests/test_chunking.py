"""Document chunking — window/stride layout, coverage, edges."""

import pyarrow as pa
import pytest

from webscraper_ray.functions.chunking import chunk_documents_batch


def _batch(texts):
    return pa.table(
        {
            "doc_id": pa.array(range(1, len(texts) + 1), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )


def test_window_stride_layout():
    toks = [f"t{i}" for i in range(10)]
    out = chunk_documents_batch(_batch([" ".join(toks)]), window=4, stride=3)
    df = out.to_pandas()
    # starts 0,3,6,9 -> sizes 4,4,4,1
    assert df["chunk_id"].tolist() == [0, 1, 2, 3]
    assert df["n_tokens"].tolist() == [4, 4, 4, 1]
    assert df["chunk_text"].tolist() == [
        "t0 t1 t2 t3",
        "t3 t4 t5 t6",
        "t6 t7 t8 t9",
        "t9",
    ]
    # overlap covers every token at least once
    seen = set()
    for c in df["chunk_text"]:
        seen.update(c.split())
    assert seen == set(toks)


def test_short_doc_single_chunk_and_empty_skipped():
    out = chunk_documents_batch(
        _batch(["just three tokens", "", "   "]), window=64, stride=48
    ).to_pandas()
    assert len(out) == 1
    assert out.iloc[0]["doc_id"] == 1
    assert out.iloc[0]["n_tokens"] == 3


def test_exact_window_boundary():
    # exactly one window: a second chunk must NOT be emitted
    out = chunk_documents_batch(
        _batch([" ".join(["x"] * 4)]), window=4, stride=4
    ).to_pandas()
    assert out["chunk_id"].tolist() == [0]


def test_bad_params_rejected():
    with pytest.raises(ValueError):
        chunk_documents_batch(_batch(["a"]), window=0, stride=1)
    with pytest.raises(ValueError):
        chunk_documents_batch(_batch(["a"]), window=4, stride=0)
