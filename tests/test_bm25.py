"""BM25 search — hand-computed scores, block-partial correctness, edges."""

import math

import numpy as np
import pyarrow as pa

import ray.data

from webscraper_ray.functions.bm25 import B, K1, bm25_topk


def _docs(texts):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(1, len(texts) + 1), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )


def _bm25(tf, df, n, dl, avgdl):
    idf = math.log((n - df + 0.5) / (df + 0.5) + 1)
    return idf * tf * (K1 + 1) / (tf + K1 * (1 - B + B * dl / avgdl))


def test_hand_computed_score(ray_session):
    texts = ["cat dog", "cat cat mouse", "bird"]
    out = (
        bm25_topk(_docs(texts), queries=[(0, "cat")], k=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    n, avgdl = 3, (2 + 3 + 1) / 3
    want1 = round(_bm25(1, 2, n, 2, avgdl), 6)
    want2 = round(_bm25(2, 2, n, 3, avgdl), 6)
    assert out["doc_id"].tolist() == [1, 2]
    assert abs(out[out.doc_id == 1]["score"].item() - want1) < 1e-9
    assert abs(out[out.doc_id == 2]["score"].item() - want2) < 1e-9


def test_multi_term_sum_and_ranking(ray_session):
    texts = ["cat dog", "cat", "dog dog", "mouse"]
    out = bm25_topk(_docs(texts), queries=[(5, "cat dog")], k=4).to_pandas()
    # doc 1 matches both terms -> highest score
    assert out.iloc[0]["doc_id"] == 1
    assert (out["query_id"] == 5).all()
    assert len(out) == 3  # mouse-only doc never scores


def test_topk_across_blocks(ray_session):
    # 40 docs in several blocks: "hit" tf increases with doc_id, so the
    # global top-3 is exactly the 3 highest doc_ids — per-block partial
    # top-k must not lose them
    texts = [" ".join(["hit"] * i + ["pad"]) for i in range(1, 41)]
    ds = _docs(texts).repartition(8)
    out = bm25_topk(ds, queries=[(0, "hit")], k=3).to_pandas()
    assert sorted(out["doc_id"].tolist()) == [38, 39, 40]


def test_absent_term_and_empty_corpus(ray_session):
    out = bm25_topk(_docs(["a b", "c"]), queries=[(0, "zzz")], k=5)
    assert out.count() == 0
    out2 = bm25_topk(_docs(["", "  "]), queries=[(0, "a")], k=5)
    assert out2.count() == 0


def test_tie_breaks_doc_id_ascending(ray_session):
    # two identical docs tie exactly -> lower doc_id first
    out = bm25_topk(
        _docs(["same text", "same text", "other words"]),
        queries=[(0, "same")],
        k=1,
    ).to_pandas()
    assert out["doc_id"].tolist() == [1]
