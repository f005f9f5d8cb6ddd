"""Top-k per group — the per-key ranking cut Ray Data lacks natively.

No reference analog (the webscraper's O1 is top-1-per-url, argmax); this
generalizes it to k>1 for training-data curation (keep the k best
documents per source/domain/cluster).

Shape: a per-batch partial top-k (vectorized lexsort + run-boundary
cumcount, no per-key Python) shrinks every block to ≤ k rows per key
BEFORE the shuffle, then the same kernel runs once per hash partition
after a single ``groupby(_part)`` all-to-all — the shuffle carries at
most k × (keys-per-block) rows, never the fact table.

Ordering contract: rows rank by ``order_col`` DESC, ties broken by
``tie_col`` ASC — exactly ``row_number() OVER (PARTITION BY key ORDER BY
order_col DESC, tie_col) <= k`` in the SQL oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from .joins import _part_column

__all__ = ["topk_per_group"]


def _topk_kernel(
    t: pa.Table,
    key: str,
    order_col: str,
    tie_col: str,
    k: int,
    ascending: bool = False,
) -> pa.Table:
    """Keep the top-k rows per key value of one in-memory table."""
    if t.num_rows == 0:
        return t
    keys = t.column(key).to_numpy(zero_copy_only=False)
    val = t.column(order_col).to_numpy(zero_copy_only=False)
    tie = t.column(tie_col).to_numpy(zero_copy_only=False)
    # sort by (key ASC, val DESC-or-ASC, tie ASC); -val flips only the
    # middle key (signed order columns only in the DESC path)
    order = np.lexsort((tie, val if ascending else -val, keys))
    ks = keys[order]
    # cumcount within each key run: position - start-of-run
    starts = np.zeros(ks.size, dtype=np.int64)
    new_run = np.flatnonzero(ks[1:] != ks[:-1]) + 1
    starts[new_run] = new_run
    np.maximum.accumulate(starts, out=starts)
    cum = np.arange(ks.size) - starts
    return t.take(pa.array(order[cum < k]))


def topk_per_group(
    ds: "ray.data.Dataset",
    *,
    key: str,
    order_col: str,
    tie_col: str,
    k: int,
    ascending: bool = False,
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    def partial(t: pa.Table) -> pa.Table:
        t = _topk_kernel(t, key, order_col, tie_col, k, ascending)
        return t.append_column("_part", _part_column(t.column(key), num_partitions))

    def final(t: pa.Table) -> pa.Table:
        return _topk_kernel(
            t.drop_columns(["_part"]), key, order_col, tie_col, k, ascending
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(final, batch_format="pyarrow")
    )
