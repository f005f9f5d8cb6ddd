"""Sequence packing: assign documents to fixed-size training context
windows by global token offset — the "pack the corpus into 2048-token
sequences" step of an LLM data pipeline.

No reference analog (task-brief training-data operator). The contract
is deterministic: documents are laid end-to-end in ``doc_id`` order;
each doc's ``global_offset`` is the sum of the token counts of all
lower-id docs, ``seq_id = global_offset // context_len`` and
``offset_in_seq = global_offset % context_len`` (greedy layout; a doc
crossing a boundary starts in its offset's window — the oracle is an
ANSI window function, so the whole pipeline is value-hash gated).

Scale shape — a two-pass distributed prefix sum, ONE data shuffle:

1. per-batch partials aggregate token counts per coarse ``doc_id``
   bucket (``doc_id // bucket_size``); the bucket table — corpus size /
   bucket_size rows, the same bounded-gather trick the frontier uses
   for exact K-th-key selection — gathers driver-side and an exclusive
   cumulative sum over it becomes the broadcast bucket-offset map;
2. ``groupby(bucket).map_groups`` computes the in-bucket exclusive
   cumsum (vectorized) and adds the bucket's global offset.

Nothing corpus-proportional reaches the driver, and the group unit
(one bucket) is bounded by ``bucket_size`` rows regardless of corpus
size.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

__all__ = ["pack_sequences"]


def _token_counts(texts: list) -> np.ndarray:
    # whitespace tokens — the same contract token_stats/the SQL oracle
    # express with string_split_regex(trim(text), '\s+')
    return np.array(
        [len(t.split()) if t and t.strip() else 0 for t in texts],
        dtype=np.int64,
    )


def pack_sequences(
    ds: "ray.data.Dataset",
    context_len: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket_size: int = 1024,
) -> "ray.data.Dataset":
    """(doc_id, n_tokens, global_offset, seq_id, offset_in_seq) for a
    greedy end-to-end layout of the corpus in ``doc_id`` order.

    Precondition: ``id_col`` values are UNIQUE (the layout is defined by
    doc order, so a duplicate id is ill-posed). Enforced per bucket —
    a duplicate raises ``ValueError`` instead of silently double-counting
    tokens in the offsets."""

    def bucket_partials(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(id_col).to_pylist(), dtype=np.int64)
        toks = _token_counts(batch.column(text_col).to_pylist())
        buckets = ids // bucket_size
        uniq, inv = np.unique(buckets, return_inverse=True)
        sums = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(sums, inv, toks)
        return pa.table(
            {
                "bucket": pa.array(uniq, pa.int64()),
                "tok": pa.array(sums, pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    bucket_tbl = (
        ds.map_batches(bucket_partials, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("tok", alias_name="tok"))
    )
    # bounded gather: corpus_rows / bucket_size entries
    buckets, toks = [], []
    for b in bucket_tbl.iter_batches(batch_format="pyarrow"):
        buckets.extend(b.column("bucket").to_pylist())
        toks.extend(b.column("tok").to_pylist())
    order = np.argsort(np.asarray(buckets, dtype=np.int64))
    bk = np.asarray(buckets, dtype=np.int64)[order]
    tk = np.asarray(toks, dtype=np.int64)[order]
    offsets = np.concatenate([[0], np.cumsum(tk)[:-1]])
    offset_ref = ray.put(dict(zip(bk.tolist(), offsets.tolist())))

    def attach_bucket(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(id_col).to_pylist(), dtype=np.int64)
        return batch.append_column(
            "bucket", pa.array(ids // bucket_size, pa.int64())
        )

    def pack_group(group: pa.Table) -> pa.Table:
        off_map = ray.get(offset_ref)
        ids = np.asarray(group.column(id_col).to_pylist(), dtype=np.int64)
        toks_g = _token_counts(group.column(text_col).to_pylist())
        o = np.argsort(ids)
        ids_s, toks_s = ids[o], toks_g[o]
        if len(ids_s) > 1 and not np.all(np.diff(ids_s) > 0):
            # A duplicated doc_id would double-count tokens in the bucket
            # offsets and yield an ill-defined layout — fail loudly (the
            # joins' overflow-guard discipline), don't emit garbage.
            dup = int(ids_s[np.flatnonzero(np.diff(ids_s) == 0)[0]])
            raise ValueError(
                f"pack_sequences requires unique {id_col}; duplicate id {dup}"
            )
        base = off_map[int(ids_s[0]) // bucket_size]
        excl = base + np.concatenate([[0], np.cumsum(toks_s)[:-1]])
        return pa.table(
            {
                "doc_id": pa.array(ids_s, pa.int64()),
                "n_tokens": pa.array(toks_s, pa.int64()),
                "global_offset": pa.array(excl, pa.int64()),
                "seq_id": pa.array(excl // context_len, pa.int64()),
                "offset_in_seq": pa.array(excl % context_len, pa.int64()),
            }
        )

    return (
        ds.map_batches(attach_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pack_group, batch_format="pyarrow")
    )
