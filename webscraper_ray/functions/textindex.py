"""Bucket-partitioned inverted index — the term-lookup scale path.

The ANN family's storage pattern (:func:`.ann.build_ann_index`) applied
to text: postings ``(token, doc_id, tf)`` are written ONCE into
``bucket=K/`` parquet partitions keyed by a hash of the token, so a
term lookup opens ONLY the files of its probe terms' buckets — I/O is
~|probe buckets|/num_buckets of the index, never a corpus scan. This is
the standard sharded-postings layout every search engine uses (public
knowledge; task-brief beyond-reference operator — the reference's only
lookup surface is the url secondary index, `cql/schema.cql:17`).

Scale shape: the build is one streaming pass (tokenize -> bucket ->
partitioned ``write_parquet``; nothing gathers — same discipline as the
crawl PageStore); postings rows are token-occurrence bounded, the
inherent inverted-index cost. Probes read file lists, not directories,
so the pruning is pinned by a unit test exactly like the ANN store's.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

import ray.data

from .joins import _part_column
from .tfidf import doc_term_freqs

__all__ = [
    "bucket_files",
    "build_text_index",
    "build_positional_index",
    "phrase_search",
    "term_postings",
    "token_bucket",
]


def token_bucket(tokens: np.ndarray, num_buckets: int) -> np.ndarray:
    """Deterministic md5 bucket per token — the SAME string-key kernel
    every hash-partition exchange uses (`joins._part_column`: md5 over
    the batch's distinct values, scattered back), so build and probe can
    never drift."""
    return (
        _part_column(pa.array(tokens), num_buckets)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )



def bucket_files(root: str, buckets) -> list[str]:
    """Sorted parquet file list of the given ``bucket=<b>`` dirs — THE
    shared probe-pruning listing for every bucket-partitioned store
    (text postings, positional postings, band index, ANN index).
    ``read_parquet`` wants explicit files when handed a path list."""
    paths: list[str] = []
    for b in sorted(int(x) for x in buckets):
        d = os.path.join(root, f"bucket={b}")
        if os.path.isdir(d):
            paths.extend(
                os.path.join(d, f)
                for f in sorted(os.listdir(d))
                if f.endswith(".parquet")
            )
    return paths


def build_text_index(
    docs: "ray.data.Dataset",
    index_dir: str,
    num_buckets: int = 64,
    text_col: str = "text",
) -> str:
    """One-time token-bucket-partitioned postings store."""

    def postings(batch: pa.Table) -> pa.Table:
        dt = doc_term_freqs(batch, text_col=text_col)
        tok = dt.column("token").to_numpy(zero_copy_only=False)
        bucket = (
            token_bucket(tok, num_buckets)
            if tok.size
            else np.array([], dtype=np.int64)
        )
        return dt.append_column("bucket", pa.array(bucket))

    docs.map_batches(postings, batch_format="pyarrow").write_parquet(
        index_dir, partition_cols=["bucket"]
    )
    return index_dir


def term_postings(
    index_dir: str,
    terms: list[str],
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """(token, doc_id, tf) for exactly ``terms`` — reads ONLY the probe
    terms' bucket files. ``num_buckets`` must match the build."""
    import pyarrow.compute as pc

    empty = pa.table(
        {
            "token": pa.array([], pa.string()),
            "doc_id": pa.array([], pa.int64()),
            "tf": pa.array([], pa.int64()),
        }
    )
    if not terms:
        return ray.data.from_arrow(empty)
    buckets = np.unique(token_bucket(np.array(sorted(set(terms))), num_buckets))
    paths = bucket_files(index_dir, buckets)
    if not paths:
        return ray.data.from_arrow(empty)
    wanted = pa.array(sorted(set(terms)), pa.string())

    def keep(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch.column("token"), value_set=wanted))

    return ray.data.read_parquet(
        paths, columns=["token", "doc_id", "tf"]
    ).map_batches(keep, batch_format="pyarrow")


def build_positional_index(
    docs: "ray.data.Dataset",
    index_dir: str,
    num_buckets: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """Positional postings store ``(token, doc_id, pos)`` in the same
    token-bucket layout — the index a PHRASE query needs (adjacency is
    a property of positions, which tf-only postings discard). Build is
    one streaming pass; rows are token-occurrence bounded."""
    from .tfidf import flat_tokens

    def postings(batch: pa.Table) -> pa.Table:
        tok_np, parent, _ = flat_tokens(batch, text_col)
        if tok_np.size == 0:
            return pa.table(
                {
                    "token": pa.array([], pa.string()),
                    "doc_id": pa.array([], pa.int64()),
                    "pos": pa.array([], pa.int64()),
                    "bucket": pa.array([], pa.int64()),
                }
            )
        ids = (
            batch.column(id_col)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)[parent]
        )
        # 0-based position within each doc's token sequence: global
        # arange minus each run's start offset
        starts = np.flatnonzero(np.diff(parent, prepend=-1))
        pos = np.arange(len(parent), dtype=np.int64) - np.repeat(
            np.arange(len(parent), dtype=np.int64)[starts],
            np.diff(np.append(starts, len(parent))),
        )
        return pa.table(
            {
                "token": pa.array(tok_np, pa.string()),
                "doc_id": pa.array(ids),
                "pos": pa.array(pos),
                "bucket": pa.array(token_bucket(tok_np, num_buckets)),
            }
        )

    docs.map_batches(postings, batch_format="pyarrow").write_parquet(
        index_dir, partition_cols=["bucket"]
    )
    return index_dir


def phrase_search(
    index_dir: str,
    first: str,
    second: str,
    num_buckets: int = 64,
    num_parts: int = 8,
) -> "ray.data.Dataset":
    """(doc_id, n_matches) for the two-token phrase ``first second``
    over a :func:`build_positional_index` store.

    Scale shape: reads ONLY the two terms' bucket files (file-pruned,
    like :func:`term_postings`), then ONE doc-keyed hash exchange of the
    two posting lists; per partition a lexsort groups each doc's
    positions and the adjacency count is a vectorized ``searchsorted``
    membership test of (pos_first + 1) in pos_second — never a per-doc
    cross join of occurrences."""
    import pyarrow.compute as pc

    empty = pa.table(
        {"doc_id": pa.array([], pa.int64()), "n_matches": pa.array([], pa.int64())}
    )
    if first == second:
        terms = [first]
    else:
        terms = [first, second]
    buckets = np.unique(token_bucket(np.array(sorted(terms)), num_buckets))
    paths = bucket_files(index_dir, buckets)
    if not paths:
        return ray.data.from_arrow(empty)
    wanted = pa.array(terms, pa.string())

    def keep(t: pa.Table) -> pa.Table:
        kept = t.filter(pc.is_in(t.column("token"), value_set=wanted))
        is_second = pc.cast(
            pc.equal(kept.column("token"), second), pa.int8()
        )
        out = pa.table(
            {
                "doc_id": kept.column("doc_id"),
                "pos": kept.column("pos"),
                "is_second": is_second,
            }
        )
        return out.append_column(
            "_part", _part_column(out.column("doc_id"), num_parts)
        )

    def count_adjacent(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return empty
        doc = part.column("doc_id").to_numpy(zero_copy_only=False)
        pos = part.column("pos").to_numpy(zero_copy_only=False)
        sec = part.column("is_second").to_numpy(zero_copy_only=False)
        order = np.lexsort((pos, sec, doc))
        doc, pos, sec = doc[order], pos[order], sec[order]
        out_d: list[int] = []
        out_n: list[int] = []
        chg = np.flatnonzero(doc[1:] != doc[:-1]) + 1
        starts = np.concatenate([[0], chg])
        ends = np.concatenate([chg, [len(doc)]])
        for s, e in zip(starts, ends):
            sv = sec[s:e]
            p = pos[s:e]
            p1 = p[sv == 0]
            p2 = p[sv == 1]
            if first == second:
                p1 = p2 = p  # single-term phrase: token equals both
            if p1.size == 0 or p2.size == 0:
                continue
            idx = np.searchsorted(p2, p1 + 1)
            hits = (idx < p2.size) & (p2[np.minimum(idx, p2.size - 1)] == p1 + 1)
            n = int(hits.sum())
            if n:
                out_d.append(int(doc[s]))
                out_n.append(n)
        if not out_d:
            return empty
        return pa.table(
            {
                "doc_id": pa.array(out_d, pa.int64()),
                "n_matches": pa.array(out_n, pa.int64()),
            }
        )

    ds = ray.data.read_parquet(paths, columns=["token", "doc_id", "pos"])
    return (
        ds.map_batches(keep, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(count_adjacent, batch_format="pyarrow")
    )
