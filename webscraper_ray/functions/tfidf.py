"""Distributed TF-IDF — per-document top-k salient terms.

The classic corpus-statistics operator a training-data pipeline needs
for topic filtering / keyword extraction (tf-idf weighting per Salton &
Buckley's SMART term-weighting family — public IR knowledge; no
reference analog, this is a task-brief beyond-reference operator). The
shape is the inverted-index build:

1. one streaming pass tokenizes each doc into DISTINCT (doc_id, token,
   tf) rows — per-batch vectorized (Arrow regex split -> flatten ->
   factorize -> composite-key ``np.unique``), never a per-token Python
   loop;
2. ONE hash-partition exchange keyed by token co-locates every posting
   of a token, so document frequency is a partition-local group size —
   no second side, no broadcast of a vocabulary-sized df table; the
   same partition immediately scores ``tf * ln(N/df)`` and keeps a
   per-doc PARTIAL top-k (correct superset: the final ranking uses the
   identical ordering), bounding the next exchange to <= k rows per doc
   per token-partition;
3. ONE exchange keyed by doc_id merges the partials into the exact
   per-doc top-k.

Scale shape: the doc-term rows are token-occurrence bounded (the
inherent tf-idf cost — same bound as any inverted index); both
exchanges carry pruned fixed-width-ish rows; the only driver scalar is
N (the corpus doc count). Scores are rounded half-away-from-zero to 6
decimals BEFORE ranking so the DuckDB oracle (same round, same ln over
float64) ranks identically.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .joins import _part_column

__all__ = ["flat_tokens", "doc_term_freqs", "tfidf_top_terms"]


def _round6_vec(x: np.ndarray) -> np.ndarray:
    # SQL ROUND: half away from zero (numpy's round is half-even)
    return np.floor(np.abs(x) * 1e6 + 0.5) / 1e6 * np.sign(x)


def flat_tokens(batch: pa.Table, text_col: str = "text"):
    """(tokens, parent row indices, n_rows) — THE repo-wide tokenizer
    kernel: Arrow regex split matching the oracle contract
    ``string_split_regex(trim(text), '\\s+')`` (RE2 semantics — Python's
    ``str.split()`` splits on MORE codepoints, e.g. \\x0b, and would
    diverge from the SQL gate). Shared by tfidf / bm25 / chunking."""
    txt = pc.fill_null(batch.column(text_col).combine_chunks(), "")
    toks = pc.split_pattern_regex(pc.utf8_trim_whitespace(txt), pattern=r"\s+")
    flat = toks.flatten()
    offsets = toks.offsets.to_numpy(zero_copy_only=False)
    parent = np.repeat(np.arange(len(toks), dtype=np.int64), np.diff(offsets))
    tok_np = flat.to_numpy(zero_copy_only=False)
    keep = tok_np != ""  # empty text trims+splits to one "" token
    return tok_np[keep], parent[keep], len(toks)


def doc_term_freqs(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """DISTINCT (doc_id, token, tf) rows for one batch. Whitespace
    tokenization via :func:`flat_tokens` — the same contract the oracle
    expresses with ``string_split_regex(trim(text), '\\s+')``. Globally
    distinct because ``map_batches`` never splits a row across batches."""
    import pandas as pd

    tok_np, parent, _ = flat_tokens(batch, text_col)
    if tok_np.size == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "token": pa.array([], pa.string()),
                "tf": pa.array([], pa.int64()),
            }
        )
    codes, uniques = pd.factorize(tok_np)
    key = parent * np.int64(len(uniques)) + codes
    ukey, tf = np.unique(key, return_counts=True)
    doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "doc_id": pa.array(doc_ids[ukey // len(uniques)], pa.int64()),
            "token": pa.array(uniques[ukey % len(uniques)], pa.string()),
            "tf": pa.array(tf.astype(np.int64)),
        }
    )


def _per_doc_topk(t: pa.Table, k: int) -> pa.Table:
    """Keep the top-k rows per doc_id by (tfidf DESC, token ASC) —
    vectorized rank via sorted group boundaries."""
    idx = pc.sort_indices(
        t,
        sort_keys=[
            ("doc_id", "ascending"),
            ("tfidf", "descending"),
            ("token", "ascending"),
        ],
    )
    t = t.take(idx)
    d = t.column("doc_id").to_numpy(zero_copy_only=False)
    starts = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
    sizes = np.diff(np.r_[starts, d.size])
    rank = np.arange(d.size) - np.repeat(starts, sizes)
    return t.filter(pa.array(rank < k))


def tfidf_top_terms(
    docs,
    k: int = 5,
    text_col: str = "text",
    num_parts: int = 32,
):
    """Per-document top-k terms by ``round(tf * ln(N/df), 6)`` (ties:
    token ascending); N = docs with at least one token. Returns
    (doc_id, token, tf, tfidf)."""

    def count_nonempty(t: pa.Table) -> pa.Table:
        trimmed = pc.utf8_trim_whitespace(
            pc.fill_null(t.column(text_col).combine_chunks(), "")
        )
        n = pc.sum(pc.not_equal(trimmed, "")).as_py() or 0
        return pa.table({"n": pa.array([n], pa.int64())})

    n_docs = docs.map_batches(count_nonempty, batch_format="pyarrow").sum("n") or 0
    if n_docs == 0:
        return_empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "token": pa.array([], pa.string()),
                "tf": pa.array([], pa.int64()),
                "tfidf": pa.array([], pa.float64()),
            }
        )
        import ray.data

        return ray.data.from_arrow(return_empty)

    def score_partition(part: pa.Table) -> pa.Table:
        # all postings of a token are in this partition: df = group size
        tok = part.column("token").to_numpy(zero_copy_only=False)
        order = np.argsort(tok, kind="stable")
        tok_s = tok[order]
        starts = np.flatnonzero(np.r_[True, tok_s[1:] != tok_s[:-1]])
        sizes = np.diff(np.r_[starts, tok_s.size])
        df = np.empty(tok_s.size, dtype=np.int64)
        df[order] = np.repeat(sizes, sizes)
        tf = part.column("tf").to_numpy(zero_copy_only=False).astype(np.float64)
        tfidf = _round6_vec(tf * np.log(np.float64(n_docs) / df))
        scored = pa.table(
            {
                "doc_id": part.column("doc_id"),
                "token": part.column("token"),
                "tf": part.column("tf"),
                "tfidf": pa.array(tfidf),
            }
        )
        return _per_doc_topk(scored, k)

    def final_topk(part: pa.Table) -> pa.Table:
        return _per_doc_topk(part.drop_columns(["_part"]), k)

    dt = docs.map_batches(
        doc_term_freqs, fn_kwargs={"text_col": text_col}, batch_format="pyarrow"
    )
    scored = (
        dt.map_batches(
            lambda t: t.append_column(
                "_part", _part_column(t.column("token"), num_parts)
            ),
            batch_format="pyarrow",
        )
        .groupby("_part")
        .map_groups(
            lambda p: score_partition(p.drop_columns(["_part"])),
            batch_format="pyarrow",
        )
    )
    return (
        scored.map_batches(
            lambda t: t.append_column(
                "_part", _part_column(t.column("doc_id"), num_parts)
            ),
            batch_format="pyarrow",
        )
        .groupby("_part")
        .map_groups(final_topk, batch_format="pyarrow")
    )
