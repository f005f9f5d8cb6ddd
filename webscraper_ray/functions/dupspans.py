"""Cross-document duplicated-span statistics (Lee et al. 2021,
"Deduplicating Training Data Makes Language Models Better",
arXiv:2107.06499 — the ExactSubstr signal, expressed over word n-grams
so it is exactly oracle-gateable).

Near-dup removal (`dedup.py`) drops WHOLE documents; the complementary
curation signal is "how much of THIS doc's content also exists
elsewhere" — boilerplate headers, license blocks, templated text — used
to down-weight or trim rather than drop. Per doc: over its DISTINCT
word n-grams, how many occur in >= 2 distinct documents.

Scale shape:
- per-batch kernel: the repo-wide ``flat_tokens`` Arrow regex split
  (the SQL gate mirrors ``string_split_regex(trim(text), '\\s+')``),
  n-gram assembly, md5_u64 HASHES (8 B per gram shipped, never the
  gram string), per-doc distinct via lexsort dedup;
- exchange 1: hash-partition by gram hash; document frequency = group
  size (each (gram, doc) pair is globally unique by construction);
  the partition REDUCES to per-doc partials (n_grams, n_dup) before
  leaving, so
- exchange 2 is doc-keyed and carries 3 ints per (doc, partition) —
  never a gram row; the final attach is a zero-filled left join against
  the id-projected corpus (docs under n tokens score 0, not missing).

md5 collisions: 64-bit over ~10^12 grams gives ~10^-5 expected extra
dup-flags corpus-wide — and the ORACLE applies the identical hash, so
the gate is exact even when a collision occurs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from .dedup import md5_u64
from .joins import _part_column
from .tfidf import flat_tokens

__all__ = ["dup_span_stats", "gram_novelty"]


def _doc_gram_hashes(batch: pa.Table, n: int, text_col: str, id_col: str):
    """Per-doc DISTINCT n-gram hashes: (doc_id, h) int64/uint64 arrays."""
    tok, parent, _ = flat_tokens(batch, text_col)
    doc_ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    if tok.size < n:
        return np.array([], np.int64), np.array([], np.uint64)
    # valid gram starts: token i..i+n-1 share one parent row
    ok = parent[: tok.size - n + 1] == parent[n - 1 :]
    starts = np.flatnonzero(ok)
    if starts.size == 0:
        return np.array([], np.int64), np.array([], np.uint64)
    grams = [" ".join(tok[i : i + n]) for i in starts]
    h = np.fromiter(
        (md5_u64(g) for g in grams), dtype=np.uint64, count=len(grams)
    )
    par = parent[starts]
    # distinct (doc, hash) within the batch == within each doc, because
    # map_batches never splits a row across batches
    order = np.lexsort((h, par))
    par, h = par[order], h[order]
    keep = np.r_[True, (par[1:] != par[:-1]) | (h[1:] != h[:-1])]
    return doc_ids[par[keep]].astype(np.int64), h[keep]


def dup_span_stats(
    docs: "ray.data.Dataset",
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_parts: int = 16,
) -> "ray.data.Dataset":
    """(doc_id, n_grams, n_dup_grams) for EVERY input doc: distinct word
    n-grams and how many of them occur in >= 2 distinct docs."""
    from ray.data.aggregate import Sum

    def emit(batch: pa.Table) -> pa.Table:
        ids, h = _doc_gram_hashes(batch, n, text_col, id_col)
        hs = h.view(np.int64)  # bit-view: partition + sort domain only
        return pa.table(
            {
                "_part": _part_column(
                    pa.chunked_array([pa.array(hs)]), num_parts
                ),
                "h": pa.array(hs),
                "doc_id": pa.array(ids),
            }
        )

    def df_reduce(part: pa.Table) -> pa.Table:
        h = part.column("h").to_numpy(zero_copy_only=False)
        d = part.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.argsort(h, kind="stable")
        h, d = h[order], d[order]
        starts = np.flatnonzero(np.r_[True, h[1:] != h[:-1]])
        sizes = np.diff(np.r_[starts, h.size])
        dup = (np.repeat(sizes, sizes) >= 2).astype(np.int64)
        # per-doc partial BEFORE the doc-keyed exchange
        od = np.argsort(d, kind="stable")
        d, dup = d[od], dup[od]
        ds_ = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
        return pa.table(
            {
                "doc_id": pa.array(d[ds_]),
                "n_grams": pa.array(np.diff(np.r_[ds_, d.size])),
                "n_dup_grams": pa.array(np.add.reduceat(dup, ds_)),
            }
        )

    # zero-filled universe: every doc contributes a (0, 0) partial into
    # the SAME doc-keyed aggregate, so docs under n tokens score 0 —
    # fully distributed, no driver gather anywhere (the corpus-sized
    # per-doc table never leaves the cluster)
    def zero_partial(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        z = np.zeros(ids.size, dtype=np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids.astype(np.int64)),
                "n_grams": pa.array(z),
                "n_dup_grams": pa.array(z),
            }
        )

    reduced = (
        docs.map_batches(emit, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(df_reduce, batch_format="pyarrow")
    )
    zeros = docs.select_columns([id_col]).map_batches(
        zero_partial, batch_format="pyarrow"
    )
    return reduced.union(zeros).groupby("doc_id").aggregate(
        Sum("n_grams", alias_name="n_grams"),
        Sum("n_dup_grams", alias_name="n_dup_grams"),
    )


def gram_novelty(
    docs: "ray.data.Dataset",
    n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_parts: int = 16,
) -> "ray.data.Dataset":
    """Vocabulary-growth attribution (the Heaps-law curve's raw
    material): for every doc, how many distinct word n-grams it
    INTRODUCES to the corpus — i.e. grams whose globally first
    occurrence (minimum doc_id) is this doc. Summed in doc order this
    yields the vocabulary-size curve; per-source rollups expose which
    sources still contribute novel content and which are recycling.

    Same scale shape as :func:`dup_span_stats`: per-doc distinct gram
    HASHES (8 B) ship once; one gram-hash-keyed exchange; each
    partition resolves first-doc = min(doc_id) per gram with one
    reduceat and reduces to (doc_id, n_introduced) partials;
    the doc-keyed exchange is output-sized, zero-filled distributively.
    """
    from ray.data.aggregate import Sum

    def emit(batch: pa.Table) -> pa.Table:
        ids, h = _doc_gram_hashes(batch, n, text_col, id_col)
        hs = h.view(np.int64)
        return pa.table(
            {
                "_part": _part_column(
                    pa.chunked_array([pa.array(hs)]), num_parts
                ),
                "h": pa.array(hs),
                "doc_id": pa.array(ids),
            }
        )

    def first_doc_reduce(part: pa.Table) -> pa.Table:
        h = part.column("h").to_numpy(zero_copy_only=False)
        d = part.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.argsort(h, kind="stable")
        h, d = h[order], d[order]
        starts = np.flatnonzero(np.r_[True, h[1:] != h[:-1]])
        fd = np.minimum.reduceat(d, starts)  # first doc per gram
        fd.sort()
        ds_ = np.flatnonzero(np.r_[True, fd[1:] != fd[:-1]])
        return pa.table(
            {
                "doc_id": pa.array(fd[ds_]),
                "n_introduced": pa.array(np.diff(np.r_[ds_, fd.size])),
            }
        )

    def zero_partial(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(ids.astype(np.int64)),
                "n_introduced": pa.array(np.zeros(ids.size, np.int64)),
            }
        )

    reduced = (
        docs.map_batches(emit, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(first_doc_reduce, batch_format="pyarrow")
    )
    zeros = docs.select_columns([id_col]).map_batches(
        zero_partial, batch_format="pyarrow"
    )
    return reduced.union(zeros).groupby("doc_id").aggregate(
        Sum("n_introduced", alias_name="n_introduced"),
    )
