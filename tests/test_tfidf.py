"""TF-IDF top-terms — kernel, edge cases, parallelism invariance."""

import numpy as np
import pyarrow as pa

import ray.data

from webscraper_ray.functions.tfidf import doc_term_freqs, tfidf_top_terms


def _docs(texts):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(1, len(texts) + 1), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )


def test_doc_term_freqs_distinct_and_counted():
    t = pa.table(
        {
            "doc_id": pa.array([7, 8], pa.int64()),
            "text": pa.array(["a b a  a", "  "], pa.string()),
        }
    )
    out = doc_term_freqs(t).to_pandas().sort_values("token")
    assert out["doc_id"].tolist() == [7, 7]
    assert out["token"].tolist() == ["a", "b"]
    assert out["tf"].tolist() == [3, 1]


def test_doc_term_freqs_null_and_empty():
    t = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array([None, ""], pa.string()),
        }
    )
    assert doc_term_freqs(t).num_rows == 0


def test_topk_scoring_and_ties(ray_session):
    # 4 docs; "common" appears everywhere (idf=0), "rare" in one doc.
    docs = _docs(
        [
            "common rare rare",
            "common x",
            "common y",
            "common z",
        ]
    )
    out = tfidf_top_terms(docs, k=1).to_pandas().sort_values("doc_id")
    # doc 1: rare tf=2, idf=ln(4/1) -> clearly beats common (idf 0)
    assert out[out.doc_id == 1]["token"].item() == "rare"
    assert out[out.doc_id == 1]["tf"].item() == 2
    expected = round(2 * np.log(4.0), 6)
    assert abs(out[out.doc_id == 1]["tfidf"].item() - expected) < 1e-9
    # docs 2-4: the singleton token wins over zero-idf "common"
    assert out[out.doc_id == 2]["token"].item() == "x"
    # ubiquitous token scores exactly 0
    full = tfidf_top_terms(docs, k=5).to_pandas()
    common = full[full.token == "common"]
    assert (common["tfidf"] == 0.0).all()


def test_tie_breaks_token_ascending(ray_session):
    # two tokens with identical tf and df in the same doc -> token ASC
    docs = _docs(["b a", "c"])
    out = tfidf_top_terms(docs, k=1).to_pandas()
    assert out[out.doc_id == 1]["token"].item() == "a"


def test_parallelism_invariance(ray_session):
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(40)]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(3, 30)))
        for _ in range(60)
    ]
    lo = (
        tfidf_top_terms(_docs(texts), k=3, num_parts=1)
        .to_pandas()
        .sort_values(["doc_id", "token"])
        .reset_index(drop=True)
    )
    hi = (
        tfidf_top_terms(_docs(texts), k=3, num_parts=16)
        .to_pandas()
        .sort_values(["doc_id", "token"])
        .reset_index(drop=True)
    )
    assert lo.equals(hi)


def test_fewer_tokens_than_k(ray_session):
    out = tfidf_top_terms(_docs(["only", "a b"]), k=5).to_pandas()
    assert len(out[out.doc_id == 1]) == 1
    assert len(out[out.doc_id == 2]) == 2


def test_all_empty_corpus(ray_session):
    out = tfidf_top_terms(_docs(["", "  "]), k=5)
    assert out.count() == 0
