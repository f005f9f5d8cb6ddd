"""Temporal joins Ray Data lacks: as-of join and range (band) join.

No reference analog (the webscraper has no temporal joins) — these are
the task-brief custom operators, built as composition (a) from the
brief's ladder: ONE hash-partition shuffle by the join key, then a
vectorized multi-key merge per partition.

Shape: each side tags rows with ``_part = hash(key) % P`` in a
``map_batches`` (multiply-shift hash, so sequential keys spread), the
two sides are unioned under a harmonized schema (the other side's
columns ride as typed nulls), and ``groupby(_part).map_groups`` performs
the single all-to-all. The per-partition merge handles EVERY key in the
partition in one numpy pass: timestamps are ranked into a shared order
(``np.unique`` + ``searchsorted``), each right row gets a composite
``key * M + rank`` (strictly ordered by (key, ts)), and the as-of /
window lookups are plain ``searchsorted`` against the sorted composites
— no per-key Python, no per-row Python.

Partitioning assumptions (documented per the brief):
- one partition's rows fit in a worker's heap — size ``num_partitions``
  to the cluster (it is the unit of parallelism AND of memory);
- ``key * (ranks + 1)`` must not overflow int64: keys and per-partition
  distinct timestamps each bounded by ~3e9 (guarded with an explicit
  check so overflow fails loudly, never silently);
- a single giant key lands in one partition, as in any hash join —
  salt upstream if one key dominates a corpus.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

__all__ = ["asof_join", "range_count_join"]

_KNUTH = np.uint64(0x9E3779B97F4A7C15)


def _part_column(key: pa.ChunkedArray, num_partitions: int) -> pa.Array:
    arr = key.to_numpy(zero_copy_only=False)
    if arr.dtype.kind in "iu":
        h = (arr.astype(np.uint64) * _KNUTH) >> np.uint64(17)
    else:
        # string/other keys: md5 over the batch's DISTINCT values only
        # (the lang_normalize trick), then scatter via the inverse index —
        # the Python hash loop is distinct-sized, never row-sized
        from .dedup import md5_u64

        uniq, inv = np.unique(arr, return_inverse=True)
        uh = np.fromiter(
            (md5_u64(str(v)) for v in uniq), dtype=np.uint64, count=len(uniq)
        )
        h = uh[inv]
    return pa.array((h % np.uint64(num_partitions)).astype(np.int32))


def _composites(
    left_ts: np.ndarray, right_ts: np.ndarray, extra: Sequence[np.ndarray] = ()
) -> tuple[np.ndarray, np.ndarray, list[np.ndarray], int]:
    """Rank all timestamps into one shared order; return per-side ranks.

    Ranks (not raw int64 microseconds) keep the composite ``key*M+rank``
    inside int64 for any real key range.
    """
    uniq = np.unique(np.concatenate([left_ts, right_ts, *extra]))
    m = uniq.size + 1
    lr = np.searchsorted(uniq, left_ts)
    rr = np.searchsorted(uniq, right_ts)
    er = [np.searchsorted(uniq, e) for e in extra]
    return lr, rr, er, m


def _int_codes(lk: np.ndarray, rk: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Partition-local int64 codes for non-integer join keys.

    The merges only need equal keys to share a code and codes to order
    consistently across the two sides, so a per-partition ``np.unique``
    factorization is exact for strings (which ``_part_column`` already
    routes here via the md5 hash); integer keys pass through untouched.
    """
    if lk.dtype.kind in "iu" and rk.dtype.kind in "iu":
        return lk.astype(np.int64, copy=False), rk.astype(np.int64, copy=False)
    both = np.concatenate([lk, rk])
    _, codes = np.unique(both, return_inverse=True)
    codes = codes.astype(np.int64)
    return codes[: lk.size], codes[lk.size :]


def _check_no_overflow(keys: np.ndarray, m: int) -> None:
    if keys.size and int(keys.max()) > (2**63 - 1) // m:
        raise OverflowError(
            f"asof/range join composite overflows int64: max key "
            f"{keys.max()} x {m} distinct timestamps; repartition finer"
        )


def _tag_side(
    ds: "ray.data.Dataset",
    key: str,
    own_cols: list[str],
    other_schema: list[tuple[str, pa.DataType]],
    side: int,
    num_partitions: int,
) -> "ray.data.Dataset":
    """Project to the harmonized union schema: _part, _side, own columns,
    and the other side's columns as typed nulls."""

    def tag(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols: dict[str, object] = {
            "_part": _part_column(t.column(key), num_partitions),
            "_side": pa.array(np.full(n, side, dtype=np.int8)),
        }
        for c in own_cols:
            cols[c] = t.column(c)
        for name, typ in other_schema:
            cols[name] = pa.nulls(n, type=typ)
        return pa.table(cols)

    return ds.map_batches(tag, batch_format="pyarrow")


def asof_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    *,
    left_key: str,
    left_ts: str,
    right_key: str,
    right_ts: str,
    right_payload: Sequence[str],
    tie_break: Optional[str] = None,
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    """For each left row, the latest right row of the same key with
    ``right_ts <= left_ts`` (inner: unmatched left rows drop).

    Ties on (key, right_ts) resolve to the greatest ``tie_break`` value
    (default: the first payload column) — the deterministic contract the
    SQL oracle pins with ``ORDER BY ts DESC, tie DESC ... rn = 1``.

    Output: all left columns + ``right_payload`` columns.
    """
    left_cols = [c for c in left.schema().names]
    payload = list(right_payload)
    overlap = set(payload) & set(left_cols)
    if overlap:
        raise ValueError(
            f"right_payload columns collide with left columns: {sorted(overlap)}"
        )
    tie = tie_break or payload[0]
    right_types = dict(zip(right.schema().names, right.schema().types))
    # harmonized union schema: left carries payload nulls, right carries
    # only (key, ts, payload) renamed into the left's key/ts columns
    payload_schema = [(c, right_types[c]) for c in payload]

    def project_right(t: pa.Table) -> pa.Table:
        cols = {left_key: t.column(right_key), left_ts: t.column(right_ts)}
        for c in payload:
            cols[c] = t.column(c)
        return pa.table(cols)

    left_side = _tag_side(
        left, left_key, left_cols, payload_schema, 1, num_partitions
    )
    other = [
        (c, t)
        for c, t in zip(left.schema().names, left.schema().types)
        if c not in (left_key, left_ts)
    ]
    right_side = _tag_side(
        right.map_batches(project_right, batch_format="pyarrow"),
        left_key,
        [left_key, left_ts, *payload],
        other,
        0,
        num_partitions,
    )
    # column order must match for union
    order = ["_part", "_side", *left_cols, *payload]
    left_side = left_side.select_columns(order)
    right_side = right_side.select_columns(order)

    def merge(t: pa.Table) -> pa.Table:
        lt = t.filter(pc.equal(t.column("_side"), pa.scalar(1, pa.int8())))
        rt = t.filter(pc.equal(t.column("_side"), pa.scalar(0, pa.int8())))
        lk = lt.column(left_key).to_numpy(zero_copy_only=False)
        ltv = lt.column(left_ts).to_numpy(zero_copy_only=False)
        rk = rt.column(left_key).to_numpy(zero_copy_only=False)
        rtv = rt.column(left_ts).to_numpy(zero_copy_only=False)
        if lk.size == 0 or rk.size == 0:
            # a partition holding only one side joins to nothing (inner)
            take_left = np.empty(0, dtype=np.int64)
            take_right = np.empty(0, dtype=np.int64)
        else:
            lk, rk = _int_codes(lk, rk)
            lr, rr, _, m = _composites(ltv, rtv)
            _check_no_overflow(np.concatenate([lk, rk]), m)
            comp_r = rk * m + rr
            # stable (key, ts, tie) order: searchsorted 'right' lands on
            # the LAST row of an equal (key, ts) run = the max tie_break
            sort_idx = np.lexsort(
                (rt.column(tie).to_numpy(zero_copy_only=False), comp_r)
            )
            comp_rs = comp_r[sort_idx]
            idx = np.searchsorted(comp_rs, lk * m + lr, side="right") - 1
            valid = idx >= 0
            safe = np.maximum(idx, 0)
            valid &= rk[sort_idx[safe]] == lk
            take_left = np.nonzero(valid)[0]
            take_right = sort_idx[idx[valid]]
        out: dict[str, pa.Array] = {}
        for c in left_cols:
            out[c] = lt.column(c).take(pa.array(take_left))
        for c in payload:
            out[c] = rt.column(c).take(pa.array(take_right))
        return pa.table(out)

    return (
        left_side.union(right_side)
        .groupby("_part")
        .map_groups(merge, batch_format="pyarrow")
    )


def range_count_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    *,
    left_key: str,
    left_ts: str,
    right_key: str,
    right_ts: str,
    lo_offset_us: int,
    hi_offset_us: int,
    count_as: str = "n_matches",
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    """Band join aggregated to counts: for each left row, how many right
    rows share its key with ``right_ts`` in
    ``[left_ts + lo_offset, left_ts + hi_offset)`` (left semantics:
    every left row survives, zero counts included).

    Output: all left columns + ``count_as`` (int64).
    """
    left_cols = [c for c in left.schema().names]

    def project_right(t: pa.Table) -> pa.Table:
        return pa.table(
            {left_key: t.column(right_key), left_ts: t.column(right_ts)}
        )

    other = [
        (c, t)
        for c, t in zip(left.schema().names, left.schema().types)
        if c not in (left_key, left_ts)
    ]
    left_side = _tag_side(left, left_key, left_cols, [], 1, num_partitions)
    right_side = _tag_side(
        right.map_batches(project_right, batch_format="pyarrow"),
        left_key,
        [left_key, left_ts],
        other,
        0,
        num_partitions,
    )
    order = ["_part", "_side", *left_cols]
    left_side = left_side.select_columns(order)
    right_side = right_side.select_columns(order)

    def merge(t: pa.Table) -> pa.Table:
        lt = t.filter(pc.equal(t.column("_side"), pa.scalar(1, pa.int8())))
        rt = t.filter(pc.equal(t.column("_side"), pa.scalar(0, pa.int8())))
        lk = lt.column(left_key).to_numpy(zero_copy_only=False)
        ltv = lt.column(left_ts).to_numpy(zero_copy_only=False)
        rk = rt.column(left_key).to_numpy(zero_copy_only=False)
        rtv = rt.column(left_ts).to_numpy(zero_copy_only=False)
        out: dict[str, pa.Array] = {}
        for c in left_cols:
            out[c] = lt.column(c)
        if lk.size == 0 or rk.size == 0:
            # no right rows in this partition: every left count is 0
            # (left semantics — left rows survive)
            counts = np.zeros(lk.size, dtype=np.int64)
        else:
            lo_vals = ltv + np.timedelta64(lo_offset_us, "us")
            hi_vals = ltv + np.timedelta64(hi_offset_us, "us")
            lk, rk = _int_codes(lk, rk)
            _, rr, (lo_r, hi_r), m = _composites(
                np.empty(0, dtype=rtv.dtype), rtv, (lo_vals, hi_vals)
            )
            _check_no_overflow(np.concatenate([lk, rk]), m)
            comp_rs = np.sort(rk * m + rr)
            lo = np.searchsorted(comp_rs, lk * m + lo_r, side="left")
            hi = np.searchsorted(comp_rs, lk * m + hi_r, side="left")
            counts = (hi - lo).astype(np.int64)
        out[count_as] = pa.array(counts)
        return pa.table(out)

    return (
        left_side.union(right_side)
        .groupby("_part")
        .map_groups(merge, batch_format="pyarrow")
    )
