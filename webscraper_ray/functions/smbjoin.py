"""Sort-merge-bucket (SMB) join: pay the shuffle ONCE at write time,
join with ZERO exchange forever after.

The classic warehouse pattern (Hive/Spark bucketed tables; the layout
half of Albutiu et al.'s MPSM sort-merge joins, VLDB'12): both tables
are written partitioned by ``hash(key) % num_buckets`` with rows SORTED
by key inside each bucket. Any later equi-join on that key reads bucket
``k`` of both stores into ONE task and merges two sorted runs — no
shuffle, no build-side broadcast, no driver involvement. At 100 TB this
converts every repeated orders⨝lineitem-style join from an all-to-all
exchange into an embarrassingly parallel per-bucket map, which is why
fact tables get bucket-written at ingest.

Same storage discipline as the ANN bucket store / crawl PageStore
(``bucket=K/`` dirs); co-partitioning REQUIRES the same ``num_buckets``
and hash on both stores — enforced by a manifest check, not a comment.

Scale shape:
- build: one map_batches (attach bucket) + one bucket-keyed exchange to
  sort within buckets, streamed straight into a partitioned parquet
  write (the only shuffle this family ever pays, amortized over every
  subsequent join);
- join: task-per-bucket ``searchsorted`` merge of two sorted runs; the
  task list is ``num_buckets`` descriptors — bytes, not data.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from .joins import knuth_bucket

__all__ = ["build_smb_store", "smb_join"]


def build_smb_store(
    ds: "ray.data.Dataset",
    key_col: str,
    store_dir: str,
    num_buckets: int = 16,
) -> str:
    """Write ``ds`` bucket-partitioned by ``hash(key) % num_buckets``,
    sorted by ``key_col`` within each bucket, plus a manifest recording
    the bucketing spec for the co-partitioning check at join time."""

    def attach_bucket(t: pa.Table) -> pa.Table:
        keys = t.column(key_col).to_numpy(zero_copy_only=False)
        if keys.dtype.kind not in "iu":
            raise TypeError(
                f"build_smb_store: {key_col} must be integer, got {keys.dtype}"
            )
        return t.append_column(
            "bucket", pa.array(knuth_bucket(keys, num_buckets), pa.int64())
        )

    def sort_bucket(t: pa.Table) -> pa.Table:
        return t.sort_by(key_col)

    (
        ds.map_batches(attach_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(sort_bucket, batch_format="pyarrow")
        .write_parquet(store_dir, partition_cols=["bucket"])
    )
    with open(os.path.join(store_dir, "_smb_manifest.json"), "w") as f:
        json.dump({"key": key_col, "num_buckets": num_buckets, "hash": "knuth17"}, f)
    return store_dir


def _manifest(store_dir: str) -> dict:
    with open(os.path.join(store_dir, "_smb_manifest.json")) as f:
        return json.load(f)


def _bucket_file_map(store_dir: str) -> dict[int, list[str]]:
    out: dict[int, list[str]] = {}
    for name in os.listdir(store_dir):
        if not name.startswith("bucket="):
            continue
        b = int(name.split("=", 1)[1])
        d = os.path.join(store_dir, name)
        out[b] = sorted(
            os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")
        )
    return out


def smb_join(
    left_dir: str,
    right_dir: str,
    left_key: str,
    right_key: str,
    left_cols: list[str],
    right_cols: list[str],
    per_bucket=None,
) -> "ray.data.Dataset":
    """Inner equi-join of two co-bucketed SMB stores — one task per
    bucket, zero shuffle. LEFT is the one-side (unique keys — enforced);
    RIGHT the many-side. Output columns: ``left_cols + right_cols``
    (key columns included only where listed). ``per_bucket``, if given,
    maps each bucket's joined table before emit — because a bucket
    holds EVERY row of its key groups, a per-key aggregate completes
    inside the task and the whole join+aggregate stays shuffle-free."""
    lm, rm = _manifest(left_dir), _manifest(right_dir)
    if (lm["num_buckets"], lm["hash"]) != (rm["num_buckets"], rm["hash"]):
        raise ValueError(
            f"SMB stores are not co-partitioned: {lm} vs {rm}"
        )
    # the stores must have been BUCKETED on the very keys being joined —
    # same hash family over different keys routes matching rows to
    # different buckets and silently drops them
    if lm["key"] != left_key or rm["key"] != right_key:
        raise ValueError(
            f"SMB stores were bucketed on ({lm['key']}, {rm['key']}), "
            f"not the join keys ({left_key}, {right_key})"
        )
    lmap, rmap = _bucket_file_map(left_dir), _bucket_file_map(right_dir)
    # inner join: a bucket absent from either side contributes nothing
    items = [
        {
            "bucket": b,
            "lfiles": json.dumps(lmap[b]),
            "rfiles": json.dumps(rmap[b]),
        }
        for b in sorted(set(lmap) & set(rmap))
    ]
    if not items:
        ls = pq.read_schema(next(iter(lmap.values()))[0]) if lmap else pa.schema([])
        rs = pq.read_schema(next(iter(rmap.values()))[0]) if rmap else pa.schema([])
        fields = [ls.field(c) for c in left_cols] + [rs.field(c) for c in right_cols]
        return ray.data.from_arrow(pa.schema(fields).empty_table())

    def merge_bucket(batch: pa.Table) -> pa.Table:
        outs = []
        for row in batch.to_pylist():
            lfiles, rfiles = json.loads(row["lfiles"]), json.loads(row["rfiles"])
            # bucket files were written sorted; concat of the bucket's
            # files preserves it only within a file, so re-check cheaply
            # and sort iff a multi-file bucket interleaved ranges.
            lt = pa.concat_tables([pq.read_table(f, columns=list({*left_cols, left_key})) for f in lfiles])
            rt = pa.concat_tables([pq.read_table(f, columns=list({*right_cols, right_key})) for f in rfiles])
            lk = lt.column(left_key).to_numpy(zero_copy_only=False)
            if lk.size > 1 and not np.all(np.diff(lk) >= 0):
                lt = lt.sort_by(left_key)
                lk = lt.column(left_key).to_numpy(zero_copy_only=False)
            if lk.size > 1 and not np.all(np.diff(lk) > 0):
                raise ValueError(
                    f"smb_join: duplicate {left_key} on the one-side "
                    f"in bucket {row['bucket']}"
                )
            rk = rt.column(right_key).to_numpy(zero_copy_only=False)
            pos = np.searchsorted(lk, rk)
            pos_c = np.clip(pos, 0, max(lk.size - 1, 0))
            hit = lk.size > 0 and rk.size > 0
            mask = (lk[pos_c] == rk) if hit else np.zeros(rk.size, dtype=bool)
            rt_m = rt.filter(pa.array(mask)) if rk.size else rt
            take_idx = pa.array(pos_c[mask], pa.int64()) if rk.size else pa.array([], pa.int64())
            cols = {}
            for c in left_cols:
                cols[c] = lt.column(c).take(take_idx)
            for c in right_cols:
                cols[c] = rt_m.column(c)
            joined = pa.table(cols)
            outs.append(per_bucket(joined) if per_bucket else joined)
        return pa.concat_tables(outs)

    return ray.data.from_items(items).map_batches(
        merge_bucket, batch_format="pyarrow", batch_size=1
    )
