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

__all__ = ["build_text_index", "term_postings", "token_bucket"]


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
    paths: list[str] = []  # explicit file lists, like the ANN probe
    for b in buckets:
        d = os.path.join(index_dir, f"bucket={b}")
        if os.path.isdir(d):
            paths.extend(
                os.path.join(d, f)
                for f in sorted(os.listdir(d))
                if f.endswith(".parquet")
            )
    if not paths:
        return ray.data.from_arrow(empty)
    wanted = pa.array(sorted(set(terms)), pa.string())

    def keep(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch.column("token"), value_set=wanted))

    return ray.data.read_parquet(
        paths, columns=["token", "doc_id", "tf"]
    ).map_batches(keep, batch_format="pyarrow")
