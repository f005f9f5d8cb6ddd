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


def global_hash_order(
    ds,
    id_col: str = "doc_id",
    salt: str = "shuffle",
    bucket_bits: int = 16,
    carry_cols: "list[str] | None" = None,
):
    """(id, rank) — a DETERMINISTIC global shuffle order: rank by
    ``(md5(salt:id), id)`` ascending, the standard trick for giving a
    training corpus a reproducible random-looking visit order without a
    seeded RNG (same corpus + salt -> same permutation on any cluster
    shape, and a changed salt is a fresh epoch order).

    Scale shape (the `global_price_rank` bucket-offset pattern): hashes
    bucket by their top ``bucket_bits`` bits; ONE bounded gather of
    per-bucket counts (<= 2^bucket_bits rows) turns into prefix-sum
    rank offsets broadcast via ``ray.put``; each bucket then ranks
    locally after a single hash-partition shuffle. Nothing
    corpus-proportional touches the driver; md5 uniformity keeps
    buckets balanced by construction — no hot-key caveat at all.

    ``carry_cols`` ride the same exchange and come back alongside
    (id, rank) — cheaper than a downstream join to re-attach payload
    columns (one exchange instead of two)."""
    import ray as _ray

    from ray.data.aggregate import Sum

    from .dedup import md5_u64

    shift = 64 - bucket_bits

    carry = list(carry_cols or [])

    def with_hash(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        hv = np.fromiter(
            (md5_u64(f"{salt}:{i}") for i in ids), dtype=np.uint64, count=len(ids)
        )
        cols = {
            "id": pa.array(ids),
            "hv": pa.array(hv),
            "bucket": pa.array((hv >> shift).astype(np.int64)),
        }
        for c in carry:
            cols[c] = t.column(c)
        return pa.table(cols)

    keyed = ds.map_batches(with_hash, batch_format="pyarrow").materialize()

    def count_partial(t: pa.Table) -> pa.Table:
        g = t.select(["bucket"]).group_by("bucket").aggregate([("bucket", "count")])
        return g.rename_columns(["bucket", "n"])

    bucket_rows = (
        keyed.map_batches(count_partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    )
    bucket_rows.sort(key=lambda r: r["bucket"])
    offsets, acc = {}, 0
    for r in bucket_rows:
        offsets[int(r["bucket"])] = acc
        acc += int(r["n"])
    off_ref = _ray.put(offsets)

    def rank_bucket(part: pa.Table) -> pa.Table:
        ids = part.column("id").to_numpy(zero_copy_only=False)
        hv = part.column("hv").to_numpy(zero_copy_only=False)
        b = int(part.column("bucket")[0].as_py())
        order = np.lexsort((ids, hv))
        rank = np.empty(len(ids), dtype=np.int64)
        rank[order] = _ray.get(off_ref)[b] + 1 + np.arange(len(ids))
        cols = {"id": pa.array(ids), "rank": pa.array(rank)}
        for c in carry:
            cols[c] = part.column(c)
        return pa.table(cols)

    return keyed.groupby("bucket").map_groups(rank_bucket, batch_format="pyarrow")


__all__.append("global_hash_order")
