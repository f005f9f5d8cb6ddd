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
- by default a single giant key lands in one partition, as in any hash
  join. ``asof_join(hot_key_threshold=...)`` removes the caveat: keys
  whose row count reaches the threshold are TIME-SLICED — each hot key
  gets ``hot_slices`` extra partitions keyed by a timestamp range, and
  every slice s > 0 is seeded with ONE injected boundary row (the hot
  key's latest right row from earlier slices, reduced distributedly to
  a |hot| x slices table before a control-sized driver prefix-argmax),
  so the as-of lookup inside a slice never needs rows outside it. The
  merge kernel is unchanged — hot slices are just more partitions. The
  residual caveat shrinks to a giant key whose rows share ONE
  timestamp (unsliceable by definition).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

__all__ = ["asof_join", "range_count_join"]

_KNUTH = np.uint64(0x9E3779B97F4A7C15)


def knuth_bucket(keys: np.ndarray, num_buckets: int) -> np.ndarray:
    """Multiplicative-hash bucket of int keys — THE shared integer
    bucketing kernel (also behind :func:`_part_column` and the SMB
    stores, whose manifests record this family as ``knuth17``; a tuned
    constant/shift must change HERE so every consumer moves together)."""
    h = (keys.astype(np.uint64) * _KNUTH) >> np.uint64(17)
    return (h % np.uint64(num_buckets)).astype(np.int64)


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


MAX_HOT_KEYS = 64  # boundary table stays <= MAX_HOT_KEYS * hot_slices rows


def _ts_us_i64(col) -> "pa.ChunkedArray | pa.Array":
    """Normalize a ts column to int64 MICROSECONDS whatever its logical
    type (timestamp of any unit, date, or plain int) — every hot-path
    computation mixes these values with *_us offsets, so the unit must
    be pinned, not inherited from the column."""
    t = col.type
    if pa.types.is_timestamp(t):
        return col.cast(pa.timestamp("us")).cast(pa.int64())
    if pa.types.is_date(t):
        return col.cast(pa.timestamp("us")).cast(pa.int64())
    return col.cast(pa.int64())


def _hot_key_stats(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    left_key: str,
    right_key: str,
    right_ts: str,
    threshold: int,
):
    """Detect keys with >= ``threshold`` rows on EITHER side and return
    ``(hot_keys, tmin, tmax)`` (right-side ts range per hot key in int64
    MICROSECONDS, the slice domain) or ``None`` when no key is hot.

    Both passes are pre-aggregated per batch (distinct-keys-per-batch
    rows enter the shuffle, never row counts); only the filtered hot
    rows — loudly capped at :data:`MAX_HOT_KEYS` — reach the driver."""
    from ray.data.aggregate import Max, Min, Sum

    if threshold <= 0:
        raise ValueError(f"hot_key_threshold must be > 0, got {threshold}")

    def lpartial(t: pa.Table) -> pa.Table:
        g = t.select([left_key]).group_by(left_key).aggregate([(left_key, "count")])
        return g.rename_columns([left_key, "cnt"])

    lc = (
        left.map_batches(lpartial, batch_format="pyarrow")
        .groupby(left_key)
        .aggregate(Sum("cnt", alias_name="cnt"))
        .filter(expr=f"cnt >= {threshold}")
        .take_all()
    )
    if len(lc) > MAX_HOT_KEYS:
        raise ValueError(
            f"asof_join: > {MAX_HOT_KEYS} hot keys on the left side; raise "
            "hot_key_threshold (the boundary table must stay control-sized)"
        )
    left_hot = [r[left_key] for r in lc]

    def rpartial(t: pa.Table) -> pa.Table:
        tt = pa.table(
            {
                right_key: t.column(right_key),
                right_ts: _ts_us_i64(t.column(right_ts)),
            }
        )
        g = tt.group_by(right_key).aggregate(
            [(right_key, "count"), (right_ts, "min"), (right_ts, "max")]
        )
        return g.rename_columns([right_key, "cnt", "tmin", "tmax"])

    ragg = (
        right.map_batches(rpartial, batch_format="pyarrow")
        .groupby(right_key)
        .aggregate(
            Sum("cnt", alias_name="cnt"),
            Min("tmin", alias_name="tmin"),
            Max("tmax", alias_name="tmax"),
        )
    )
    if left_hot:
        lh = pa.array(left_hot)

        def keep(t: pa.Table) -> pa.Table:
            m = pc.or_(
                pc.greater_equal(t.column("cnt"), pa.scalar(threshold)),
                pc.is_in(t.column(right_key), value_set=lh),
            )
            return t.filter(m)

        rc = ragg.map_batches(keep, batch_format="pyarrow").take_all()
    else:
        rc = ragg.filter(expr=f"cnt >= {threshold}").take_all()
    if len(rc) > MAX_HOT_KEYS:
        raise ValueError(
            f"asof_join: > {MAX_HOT_KEYS} hot keys on the right side; raise "
            "hot_key_threshold (the boundary table must stay control-sized)"
        )
    rstats = {r[right_key]: (r["tmin"], r["tmax"]) for r in rc}
    hot = sorted(
        set(left_hot)
        | {r[right_key] for r in rc if r["cnt"] >= threshold}
    )
    if not hot:
        return None
    tmin = np.array([rstats.get(k, (0, 0))[0] for k in hot], dtype=np.int64)
    tmax = np.array([rstats.get(k, (0, 0))[1] for k in hot], dtype=np.int64)
    return hot, tmin, tmax


def _hot_part_ids(
    key_col: pa.ChunkedArray,
    ts_col: pa.ChunkedArray,
    base_part: pa.Array,
    hot_keys: pa.Array,
    tmin: np.ndarray,
    tmax: np.ndarray,
    num_partitions: int,
    hot_slices: int,
) -> pa.Array:
    """Partition ids with hot keys routed to ``P + hot_idx*S + slice``
    (vectorized: arrow ``index_in`` for the key lookup, int64 math for
    the equal-width time slice, clipped so out-of-range probes land in
    the first/last slice)."""
    idx = pc.index_in(key_col, value_set=hot_keys)
    idx_np = idx.to_numpy(zero_copy_only=False)  # float with NaN for miss
    hot_mask = ~np.isnan(idx_np) if idx_np.dtype.kind == "f" else idx_np >= 0
    part = base_part.to_numpy(zero_copy_only=False).astype(np.int32).copy()
    if hot_mask.any():
        hi = idx_np[hot_mask].astype(np.int64)
        ts = _ts_us_i64(ts_col).to_numpy(zero_copy_only=False)[hot_mask]
        span = tmax[hi] - tmin[hi] + 1
        s = np.clip((ts - tmin[hi]) * hot_slices // span, 0, hot_slices - 1)
        part[hot_mask] = (num_partitions + hi * hot_slices + s).astype(np.int32)
    return pa.array(part, pa.int32())


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
    hot_key_threshold: Optional[int] = None,
    hot_slices: int = 16,
) -> "ray.data.Dataset":
    """For each left row, the latest right row of the same key with
    ``right_ts <= left_ts`` (inner: unmatched left rows drop).

    Ties on (key, right_ts) resolve to the greatest ``tie_break`` value
    (default: the first payload column) — the deterministic contract the
    SQL oracle pins with ``ORDER BY ts DESC, tie DESC ... rn = 1``.

    ``hot_key_threshold``: when set, keys with at least that many rows
    on either side are TIME-SLICED into ``hot_slices`` extra partitions
    with injected boundary rows (module docstring) — identical output,
    parallel instead of single-partition execution for giant keys.

    Output: all left columns + ``right_payload`` columns.
    """
    if hot_key_threshold is not None:
        # the hot path consumes each input more than once (stats pass,
        # tagged union, boundary pass) — pin the inputs so upstream
        # pipelines execute exactly once
        left = left.materialize()
        right = right.materialize()
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

    union_ds = left_side.union(right_side)

    if hot_key_threshold is not None:
        stats = _hot_key_stats(
            left, right, left_key, right_key, right_ts, hot_key_threshold
        )
    else:
        stats = None
    if stats is not None:
        hot_keys, tmin, tmax = stats
        hk_arr = pa.array(hot_keys)
        S = hot_slices

        def rehot(t: pa.Table) -> pa.Table:
            newp = _hot_part_ids(
                t.column(left_key), t.column(left_ts), t.column("_part"),
                hk_arr, tmin, tmax, num_partitions, S,
            )
            i = t.schema.get_field_index("_part")
            return t.set_column(i, "_part", newp)

        union_ds = union_ds.map_batches(rehot, batch_format="pyarrow")

        # --- boundary rows: per (hot key, slice) the latest earlier-
        # slice right row, reduced distributedly then prefix-scanned on
        # a <= |hot| x S table driver-side ---
        def bpartial(t: pa.Table) -> pa.Table:
            empty = pa.table(
                {
                    "_b": pa.array([], pa.int64()),
                    left_key: pa.array([], type=t.schema.field(left_key).type),
                    left_ts: pa.array([], type=t.schema.field(left_ts).type),
                    **{
                        c: pa.array([], type=typ)
                        for c, typ in payload_schema
                    },
                }
            )
            idx = pc.index_in(t.column(left_key), value_set=hk_arr)
            idx_np = idx.to_numpy(zero_copy_only=False)
            hot_mask = (
                ~np.isnan(idx_np) if idx_np.dtype.kind == "f" else idx_np >= 0
            )
            if not hot_mask.any():
                return empty
            sub = t.filter(pa.array(hot_mask))
            hi = idx_np[hot_mask].astype(np.int64)
            ts = _ts_us_i64(sub.column(left_ts)).to_numpy(zero_copy_only=False)
            span = tmax[hi] - tmin[hi] + 1
            s = np.clip((ts - tmin[hi]) * S // span, 0, S - 1)
            b = hi * S + s
            _, tie_codes = np.unique(
                sub.column(tie).to_numpy(zero_copy_only=False),
                return_inverse=True,
            )
            order = np.lexsort((tie_codes, ts, b))
            bb = b[order]
            take = order[np.r_[bb[1:] != bb[:-1], True]]
            out = sub.take(pa.array(take)).select([left_key, left_ts, *payload])
            return out.add_column(
                0, "_b", pa.array(b[take].astype(np.int64))
            )

        def breduce(g: pa.Table) -> pa.Table:
            ts = g.column(left_ts).to_numpy(zero_copy_only=False)
            _, tie_codes = np.unique(
                g.column(tie).to_numpy(zero_copy_only=False),
                return_inverse=True,
            )
            best = int(np.lexsort((tie_codes, ts))[-1])
            return g.take(pa.array([best]))

        bound = (
            right.map_batches(project_right, batch_format="pyarrow")
            .map_batches(bpartial, batch_format="pyarrow")
            .groupby("_b")
            .map_groups(breduce, batch_format="pyarrow")
            .take_all()  # <= |hot| x S rows — control-sized by the cap
        )
        per_key: dict[int, dict[int, dict]] = {}
        for r in bound:
            hi, s = divmod(int(r["_b"]), S)
            per_key.setdefault(hi, {})[s] = r
        left_types = dict(zip(left.schema().names, left.schema().types))
        cols: dict[str, list] = {c: [] for c in order}
        for hi, slices in per_key.items():
            best = None
            for s in range(S):
                if best is not None:
                    cols["_part"].append(num_partitions + hi * S + s)
                    cols["_side"].append(0)
                    for c in left_cols:
                        if c == left_key:
                            cols[c].append(best[left_key])
                        elif c == left_ts:
                            cols[c].append(best[left_ts])
                        else:
                            cols[c].append(None)
                    for c in payload:
                        cols[c].append(best[c])
                cand = slices.get(s)
                if cand is not None and (
                    best is None
                    or (cand[left_ts], cand[tie]) > (best[left_ts], best[tie])
                ):
                    best = cand
        if cols["_part"]:
            arrays = {
                "_part": pa.array(cols["_part"], pa.int32()),
                "_side": pa.array(cols["_side"], pa.int8()),
            }
            for c in left_cols:
                arrays[c] = pa.array(cols[c], type=left_types[c])
            for c, typ in payload_schema:
                arrays[c] = pa.array(cols[c], type=typ)
            bt = pa.table({c: arrays[c] for c in order})
            union_ds = union_ds.union(ray.data.from_arrow(bt))

    return union_ds.groupby("_part").map_groups(merge, batch_format="pyarrow")


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
    hot_key_threshold: Optional[int] = None,
    hot_slices: int = 16,
) -> "ray.data.Dataset":
    """Band join aggregated to counts: for each left row, how many right
    rows share its key with ``right_ts`` in
    ``[left_ts + lo_offset, left_ts + hi_offset)`` (left semantics:
    every left row survives, zero counts included).

    ``hot_key_threshold``: keys with at least that many rows on either
    side are TIME-SLICED over ``hot_slices`` extra partitions. A
    windowed COUNT can't use boundary rows (it needs every in-window
    row, not the latest), so hot RIGHT rows replicate into the <= 2
    slices whose left probes can reach them — the slice width is
    clamped to at least the window width, which bounds replication at
    2x by construction. Left rows route to exactly one slice, so no
    count can double.

    Output: all left columns + ``count_as`` (int64).
    """
    if hot_key_threshold is not None:
        left = left.materialize()
        right = right.materialize()
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

    union_ds = left_side.union(right_side)

    if hot_key_threshold is not None:
        stats = _hot_key_stats(
            left, right, left_key, right_key, right_ts, hot_key_threshold
        )
    else:
        stats = None
    if stats is not None:
        hot_keys, tmin, tmax = stats
        hk_arr = pa.array(hot_keys)
        S = hot_slices
        window = hi_offset_us - lo_offset_us
        span = tmax - tmin + 1
        # slice width >= window bounds right replication at 2 copies
        width = np.maximum(np.maximum((span + S - 1) // S, window), 1)

        def rehot_rc(t: pa.Table) -> pa.Table:
            idx = pc.index_in(t.column(left_key), value_set=hk_arr)
            idx_np = idx.to_numpy(zero_copy_only=False)
            hot_mask = (
                ~np.isnan(idx_np) if idx_np.dtype.kind == "f" else idx_np >= 0
            )
            if not hot_mask.any():
                return t
            pi = t.schema.get_field_index("_part")
            cold = t.filter(pa.array(~hot_mask))
            hi_idx = idx_np[hot_mask].astype(np.int64)
            sub = t.filter(pa.array(hot_mask))
            ts = _ts_us_i64(sub.column(left_ts)).to_numpy(zero_copy_only=False)
            side = sub.column("_side").to_numpy(zero_copy_only=False)
            w = width[hi_idx]
            t0 = tmin[hi_idx]
            base_id = num_partitions + hi_idx * S
            pieces = [cold]
            lm = side == 1
            if lm.any():
                s = np.clip((ts[lm] - t0[lm]) // w[lm], 0, S - 1)
                lt_tbl = sub.filter(pa.array(lm))
                pieces.append(
                    lt_tbl.set_column(
                        pi, "_part",
                        pa.array((base_id[lm] + s).astype(np.int32)),
                    )
                )
            rm = ~lm
            if rm.any():
                rt_tbl = sub.filter(pa.array(rm))
                # left probes t matching right r: r-hi < t <= r-lo
                s_lo = np.clip(
                    (ts[rm] - hi_offset_us + 1 - t0[rm]) // w[rm], 0, S - 1
                )
                s_hi = np.clip(
                    (ts[rm] - lo_offset_us - t0[rm]) // w[rm], 0, S - 1
                )
                pieces.append(
                    rt_tbl.set_column(
                        pi, "_part",
                        pa.array((base_id[rm] + s_lo).astype(np.int32)),
                    )
                )
                dup = s_hi > s_lo
                if dup.any():
                    rep = rt_tbl.filter(pa.array(dup))
                    pieces.append(
                        rep.set_column(
                            pi, "_part",
                            pa.array(
                                (base_id[rm][dup] + s_hi[dup]).astype(np.int32)
                            ),
                        )
                    )
            return pa.concat_tables(pieces)

        union_ds = union_ds.map_batches(rehot_rc, batch_format="pyarrow")

    return union_ds.groupby("_part").map_groups(merge, batch_format="pyarrow")
