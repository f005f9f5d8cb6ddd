"""Distributed BM25 keyword search — top-k documents per query.

Text-side similarity search (complements the ANN family): score every
document against a SMALL set of keyword queries with Okapi BM25
(Robertson et al., TREC-3 — public IR knowledge; task-brief
beyond-reference operator) and return the global top-k per query.

Scale shape — two streaming corpus passes, no shuffle of corpus rows:

1. stats pass: per-batch partials for N (nonempty docs), total token
   count (-> avgdl) and per-QUERY-TERM document frequencies, reduced to
   a driver table bounded by the number of query terms (a few rows) —
   never a vocabulary-sized exchange;
2. score pass: per-batch vectorized tf of the query terms only
   (token-mask -> composite-key ``np.unique``), BM25 accumulate per
   (query, doc), then per-block PARTIAL top-k so the final exchange
   carries <= k rows per query per block; a single small sort/limit per
   query finishes exactly.

Only driver artifacts: the query-term df map and the (k x queries)
result. Scores are rounded half-away to 6 decimals BEFORE ranking so
the DuckDB oracle ranks identically.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .tfidf import _round6_vec, flat_tokens as _tokenize_flat

__all__ = ["DEFAULT_QUERIES", "bm25_topk", "K1", "B"]

K1 = 1.2
B = 0.75

# (query_id, query text) — terms drawn from the synthetic corpus's
# vocabulary; the oracle SQL is generated from this SAME list.
DEFAULT_QUERIES = [
    (0, "hash join"),
    (1, "window sort stream"),
    (2, "customer order query"),
    (3, "vector scan"),
]


def bm25_topk(
    docs,
    queries=None,
    k: int = 10,
    text_col: str = "text",
):
    """(query_id, doc_id, score): global top-k docs per keyword query by
    BM25 (k1=1.2, b=0.75, idf = ln((N-df+0.5)/(df+0.5)+1); ties:
    doc_id ascending)."""
    import ray.data

    queries = DEFAULT_QUERIES if queries is None else queries
    terms = sorted({t for _, q in queries for t in q.split()})
    terms_np = np.array(terms)
    q_term_idx = [
        (qid, np.searchsorted(terms_np, sorted(set(q.split()))))
        for qid, q in queries
    ]

    # ---- pass 1: N, total dl, per-term df — ONE partial table per batch
    def stats_partial(batch: pa.Table) -> pa.Table:
        tok, parent, _ = _tokenize_flat(batch, text_col)
        n_docs = np.unique(parent).size  # docs with >= 1 token
        mask = np.isin(tok, terms_np)
        tok_m, par_m = tok[mask], parent[mask]
        ti = np.searchsorted(terms_np, tok_m)
        # df partial: distinct docs per term within the batch
        key = par_m * np.int64(len(terms)) + ti
        ukey = np.unique(key)
        df = np.bincount(ukey % len(terms), minlength=len(terms))
        return pa.table(
            {
                "term_id": pa.array(
                    np.r_[np.arange(len(terms)), [-1, -2]].astype(np.int64)
                ),
                "val": pa.array(
                    np.r_[df, [n_docs, tok.size]].astype(np.int64)
                ),
            }
        )

    from ray.data.aggregate import Sum

    stats = (
        docs.map_batches(stats_partial, batch_format="pyarrow")
        .groupby("term_id")
        .aggregate(Sum("val", alias_name="val"))
        .take_all()
    )  # bounded: len(terms) + 2 rows
    sm = {r["term_id"]: r["val"] for r in stats}
    n_docs = int(sm.get(-1, 0) or 0)
    if n_docs == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "doc_id": pa.array([], pa.int64()),
                    "score": pa.array([], pa.float64()),
                }
            )
        )
    avgdl = float(sm.get(-2, 0) or 0) / n_docs
    df = np.array([sm.get(i, 0) or 0 for i in range(len(terms))], dtype=np.float64)
    idf = np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)

    # ---- pass 2: score + per-block partial top-k per query
    def score_partial(batch: pa.Table) -> pa.Table:
        tok, parent, n_rows = _tokenize_flat(batch, text_col)
        dl = np.bincount(parent, minlength=n_rows).astype(np.float64)
        mask = np.isin(tok, terms_np)
        tok_m, par_m = tok[mask], parent[mask]
        empty = pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "doc_id": pa.array([], pa.int64()),
                "score": pa.array([], pa.float64()),
            }
        )
        if tok_m.size == 0:
            return empty
        ti = np.searchsorted(terms_np, tok_m)
        key = par_m * np.int64(len(terms)) + ti
        ukey, tf = np.unique(key, return_counts=True)
        row = (ukey // len(terms)).astype(np.int64)
        term = (ukey % len(terms)).astype(np.int64)
        tf = tf.astype(np.float64)
        denom = tf + K1 * (1.0 - B + B * dl[row] / avgdl)
        w = idf[term] * tf * (K1 + 1.0) / denom
        doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        parts = []
        for qid, tidx in q_term_idx:
            sel = np.isin(term, tidx)
            if not sel.any():
                continue
            r = row[sel]
            uniq_r, inv = np.unique(r, return_inverse=True)
            score = np.zeros(uniq_r.size)
            np.add.at(score, inv, w[sel])
            score = _round6_vec(score)
            # partial top-k: (score DESC, doc_id ASC)
            d = doc_ids[uniq_r]
            order = np.lexsort((d, -score))[:k]
            parts.append(
                pa.table(
                    {
                        "query_id": pa.array(
                            np.full(order.size, qid, dtype=np.int64)
                        ),
                        "doc_id": pa.array(d[order].astype(np.int64)),
                        "score": pa.array(score[order]),
                    }
                )
            )
        return pa.concat_tables(parts) if parts else empty

    def final_topk(part: pa.Table) -> pa.Table:
        qid = part.column("query_id").to_numpy(zero_copy_only=False)
        d = part.column("doc_id").to_numpy(zero_copy_only=False)
        s = part.column("score").to_numpy(zero_copy_only=False)
        out = []
        for q in np.unique(qid):
            m = qid == q
            order = np.lexsort((d[m], -s[m]))[:k]
            out.append(
                pa.table(
                    {
                        "query_id": pa.array(np.full(order.size, q, dtype=np.int64)),
                        "doc_id": pa.array(d[m][order]),
                        "score": pa.array(s[m][order]),
                    }
                )
            )
        return pa.concat_tables(out)

    partials = docs.map_batches(score_partial, batch_format="pyarrow")
    # the reduce input is <= k rows per query per block — ONE tiny group
    return (
        partials.groupby("query_id")
        .map_groups(final_topk, batch_format="pyarrow")
    )
