"""Snapshot diff — change-data-capture between two corpus versions.

A recurring crawl produces SNAPSHOTS; the incremental-processing staple
is "what changed since last run" (re-extract only modified pages,
tombstone deleted ones, admit added ones) — the reference's freshness
TTL (`src/crawler.ts` re-scrape window) answers *when* to refetch, this
operator answers *what actually differs* between two materialized runs.

Scale shape:
- each side ships (id, md5-of-payload) ONLY — 40 B/row regardless of
  document size; the hashes are computed streaming in the side's own
  map_batches pass;
- ONE union-tag hash-partition exchange by id (the joins.py pattern);
  per partition a vectorized sorted merge classifies added / deleted /
  modified and drops unchanged rows, so the OUTPUT is change-sized,
  never corpus-sized;
- no driver involvement at any point.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data

from .joins import _part_column

__all__ = ["snapshot_diff"]


def _tag(side: int, id_col: str, text_col: str, num_parts: int):
    def fn(t: pa.Table) -> pa.Table:
        ids = t.column(id_col)
        texts = t.column(text_col).to_pylist()
        h = pa.array(
            [hashlib.md5((x or "").encode("utf-8")).hexdigest() for x in texts],
            pa.string(),
        )
        return pa.table(
            {
                "_part": _part_column(ids, num_parts),
                "_side": pa.array(np.full(t.num_rows, side, dtype=np.int8)),
                "id": ids.cast(pa.int64()),
                "h": h,
            }
        )

    return fn


def snapshot_diff(
    old: "ray.data.Dataset",
    new: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    num_parts: int = 16,
) -> "ray.data.Dataset":
    """(doc_id, change) rows — change in {'added','deleted','modified'};
    unchanged ids emit nothing. Requires ids unique per side (loudly
    checked per partition, the packing guard discipline)."""

    def classify(part: pa.Table) -> pa.Table:
        side = part.column("_side").to_numpy(zero_copy_only=False)
        ids = part.column("id").to_numpy(zero_copy_only=False)
        h = np.asarray(part.column("h").to_pylist(), dtype=object)
        out_ids: list[np.ndarray] = []
        out_chg: list[np.ndarray] = []
        o_ids, o_h = ids[side == 0], h[side == 0]
        n_ids, n_h = ids[side == 1], h[side == 1]
        oo, no = np.argsort(o_ids), np.argsort(n_ids)
        o_ids, o_h = o_ids[oo], o_h[oo]
        n_ids, n_h = n_ids[no], n_h[no]
        for nm, arr in (("old", o_ids), ("new", n_ids)):
            if arr.size > 1 and not np.all(np.diff(arr) > 0):
                dup = int(arr[np.flatnonzero(np.diff(arr) == 0)[0]])
                raise ValueError(
                    f"snapshot_diff requires unique ids per side; "
                    f"duplicate id {dup} on the {nm} side"
                )
        # deleted: in old, not in new
        idx = np.searchsorted(n_ids, o_ids)
        present = (idx < n_ids.size) & (
            n_ids[np.minimum(idx, max(n_ids.size - 1, 0))] == o_ids
        ) if n_ids.size else np.zeros(o_ids.size, bool)
        out_ids.append(o_ids[~present])
        out_chg.append(np.full((~present).sum(), "deleted", dtype=object))
        # modified: in both, hash differs
        both_o = o_ids[present]
        both_oh = o_h[present]
        both_nh = n_h[idx[present]] if n_ids.size else np.array([], object)
        diff = both_oh != both_nh
        out_ids.append(both_o[diff])
        out_chg.append(np.full(int(diff.sum()), "modified", dtype=object))
        # added: in new, not in old
        jdx = np.searchsorted(o_ids, n_ids)
        known = (jdx < o_ids.size) & (
            o_ids[np.minimum(jdx, max(o_ids.size - 1, 0))] == n_ids
        ) if o_ids.size else np.zeros(n_ids.size, bool)
        out_ids.append(n_ids[~known])
        out_chg.append(np.full((~known).sum(), "added", dtype=object))
        return pa.table(
            {
                "doc_id": pa.array(
                    np.concatenate(out_ids).astype(np.int64), pa.int64()
                ),
                "change": pa.array(
                    list(np.concatenate(out_chg)), pa.string()
                ),
            }
        )

    tagged = old.map_batches(
        _tag(0, id_col, text_col, num_parts), batch_format="pyarrow"
    ).union(
        new.map_batches(_tag(1, id_col, text_col, num_parts), batch_format="pyarrow")
    )
    return tagged.groupby("_part").map_groups(classify, batch_format="pyarrow")
