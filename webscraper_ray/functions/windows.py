"""Stream-shaped operators over the ``events`` log (ray_guide §streaming).

Ray Data has no event-time windows; the batch equivalents treat events
as an ordered, user-partitioned log. Tumbling/hopping counts pre-combine
per batch before a tiny groupby; sessionize hash-partitions by user and
processes every user of a partition in ONE vectorized numpy pass
(lexsort + reduceat) — never one Python dispatch per user. The ordering
assumption (per-key ts order) is established inside the kernel, never
globally.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

__all__ = [
    "tumbling_counts",
    "hopping_counts",
    "sessionize",
    "funnel_stages",
    "rolling_sum",
    "rolling_median",
    "range_rolling",
    "event_gaps",
    "session_paths",
]


def tumbling_counts(ds: "ray.data.Dataset", hours: int = 1) -> "ray.data.Dataset":
    """(event_type, window_start, n_events, sum_value): tumbling window by
    wall-clock hour bucket. Pre-aggregated per batch (partial combine)
    before the small groupby — the shuffle carries one row per
    (type, window, batch), not per event."""

    window_us = hours * 3_600_000_000

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # floor to the window boundary with the arrow temporal kernel
        # (keeps timestamp[us] precision; pandas dtype round-trips can
        # silently coarsen it)
        floored = pc.floor_temporal(batch.column("ts"), multiple=hours, unit="hour")
        # exact int64 cents: parallel float sums are order-dependent and
        # would diverge from the sequential SQL oracle at scale
        value_c = pc.round(
            pc.multiply(batch.column("value"), pa.scalar(100.0))
        ).cast(pa.int64())
        t = pa.table(
            {
                "event_type": batch.column("event_type"),
                "window_start": floored,
                "event_id": batch.column("event_id"),
                "value_c": value_c,
            }
        )
        g = t.group_by(["event_type", "window_start"]).aggregate(
            [("event_id", "count"), ("value_c", "sum")]
        )
        return g.rename_columns(
            ["event_type", "window_start", "n_events", "value_c"]
        )

    from ray.data.aggregate import Sum

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # Ray's shuffle can coarsen timestamp keys to [s]; restore the
        # source precision so the output schema matches the oracle's.
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "window_start": t.column("window_start").cast(pa.timestamp("us")),
                "n_events": t.column("n_events"),
                "sum_value": pc.divide(
                    t.column("value_c").cast(pa.float64()), 100.0
                ),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("value_c", alias_name="value_c"),
        )
        .map_batches(finish, batch_format="pyarrow")
    )


def hopping_counts(
    ds: "ray.data.Dataset", size_minutes: int = 60, hop_minutes: int = 30
) -> "ray.data.Dataset":
    """Overlapping (hopping) windows: each event lands in
    ``size/hop`` windows whose starts are the hop-aligned times in
    ``(ts - size, ts]``. Same partial-aggregation discipline as the
    tumbling window — events fan out to (type, window, partial) rows
    per batch and only those shuffle.
    """
    import numpy as np
    import pyarrow.compute as pc

    size_us = size_minutes * 60_000_000
    hop_us = hop_minutes * 60_000_000
    fanout = size_us // hop_us

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        value_c = (
            pc.round(pc.multiply(batch.column("value"), pa.scalar(100.0)))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        types = batch.column("event_type")
        # latest hop-aligned start <= ts, then the fanout-1 earlier hops
        base = (ts // hop_us) * hop_us
        starts = base[:, None] - np.arange(fanout, dtype=np.int64)[None, :] * hop_us
        n = len(ts)
        t = pa.table(
            {
                "event_type": pc.take(
                    types, pa.array(np.repeat(np.arange(n), fanout), pa.int64())
                ),
                "window_start": pa.array(starts.reshape(-1), pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "value_c": pa.array(np.repeat(value_c, fanout), pa.int64()),
            }
        )
        g = t.group_by(["event_type", "window_start"]).aggregate(
            [("value_c", "count"), ("value_c", "sum")]
        )
        return g.rename_columns(["event_type", "window_start", "n_events", "value_c"])

    from ray.data.aggregate import Sum

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "window_start": t.column("window_start").cast(pa.timestamp("us")),
                "n_events": t.column("n_events"),
                "sum_value": pc.divide(t.column("value_c").cast(pa.float64()), 100.0),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("value_c", alias_name="value_c"),
        )
        .map_batches(finish, batch_format="pyarrow")
    )


_SESSION_PARTS = 32
_KNUTH = np.uint64(0x9E3779B97F4A7C15)


def sessionize(
    ds: "ray.data.Dataset",
    gap_minutes: int = 30,
    num_parts: int = _SESSION_PARTS,
) -> "ray.data.Dataset":
    """(user_id, n_sessions, n_events): sessions split on > gap idle time.

    ONE hash-partition shuffle on user_id (sessions need every event of a
    user together — gaps span batches, so no per-batch partial exists);
    each partition handles ALL its users in one vectorized pass (lexsort
    + reduceat over user boundaries), never one Python call per user
    (per-user map_groups measured 10 s for 1.5k users at the sf1 bench
    point). Matches the SQL lag()/sum() session construction exactly.
    """
    gap = np.timedelta64(gap_minutes * 60_000_000, "us")

    def add_part(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        return t.append_column(
            "_p", pa.array(((u * _KNUTH) % np.uint64(num_parts)).astype(np.int32))
        )

    def per_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "n_sessions": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                }
            )
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = t.column("ts").to_numpy(zero_copy_only=False)
        order = np.lexsort((ts, u))
        u, ts = u[order], ts[order]
        new_user = np.concatenate([[True], u[1:] != u[:-1]])
        diffs = np.concatenate([[np.timedelta64(0, "us")], ts[1:] - ts[:-1]])
        new_session = new_user | (diffs > gap)
        starts = np.flatnonzero(new_user)
        ends = np.concatenate([starts[1:], [len(u)]])
        return pa.table(
            {
                "user_id": pa.array(u[starts]),
                "n_sessions": pa.array(
                    np.add.reduceat(new_session.astype(np.int64), starts), pa.int64()
                ),
                "n_events": pa.array((ends - starts).astype(np.int64), pa.int64()),
            }
        )

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("_p")
        .map_groups(per_part, batch_format="pyarrow")
    )


def funnel_stages(
    ds: "ray.data.Dataset",
    stages: tuple[str, str, str] = ("view", "click", "purchase"),
    num_parts: int = _SESSION_PARTS,
) -> "ray.data.Dataset":
    """(user_id, reached_stage): the classic ordered conversion funnel —
    stage 1 = first ``stages[0]``, stage 2 = first ``stages[1]`` AFTER
    that, stage 3 = first ``stages[2]`` after THAT; 0 = none.

    Same shape as :func:`sessionize`: ONE hash-partition shuffle on
    user_id (ordering spans batches), then every user of a partition in
    one vectorized pass — three masked min-reduceat sweeps chained
    through per-user sentinels, never a Python loop per user.
    """
    s1, s2, s3 = stages
    SENT = np.iinfo(np.int64).max

    def add_part(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        return t.append_column(
            "_p", pa.array(((u * _KNUTH) % np.uint64(num_parts)).astype(np.int32))
        )

    def per_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "reached_stage": pa.array([], pa.int64()),
                }
            )
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = (
            t.column("ts")
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .view(np.int64)
        )
        et = t.column("event_type").to_numpy(zero_copy_only=False)
        order = np.lexsort((ts, u))
        u, ts, et = u[order], ts[order], et[order]
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        group = np.zeros(u.size, dtype=np.int64)
        group[starts] = 1
        group = np.cumsum(group) - 1  # per-row user index

        def first_after(kind: str, after: np.ndarray) -> np.ndarray:
            # min ts among rows of `kind` strictly after the user's
            # `after` time (SENT = stage not reached)
            masked = np.where((et == kind) & (ts > after[group]), ts, SENT)
            return np.minimum.reduceat(masked, starts)

        t0 = np.full(starts.size, -(2**62), dtype=np.int64)
        t1 = first_after(s1, t0)
        t2 = first_after(s2, t1)
        t3 = first_after(s3, t2)
        reached = (
            (t1 != SENT).astype(np.int64)
            + (t2 != SENT).astype(np.int64)
            + (t3 != SENT).astype(np.int64)
        )
        return pa.table(
            {
                "user_id": pa.array(u[starts]),
                "reached_stage": pa.array(reached),
            }
        )

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("_p")
        .map_groups(per_part, batch_format="pyarrow")
    )


def _user_sorted(t: pa.Table):
    """Per-partition total order (user_id, ts, event_id) — event_id is
    unique, so the order (and every frame computed over it) is exact."""
    u = t.column("user_id").to_numpy(zero_copy_only=False)
    ts = (
        t.column("ts")
        .to_numpy(zero_copy_only=False)
        .astype("datetime64[us]")
        .view(np.int64)
    )
    eid = t.column("event_id").to_numpy(zero_copy_only=False)
    order = np.lexsort((eid, ts, u))
    return order, u[order], ts[order], eid[order]


def rolling_sum(
    ds: "ray.data.Dataset",
    preceding: int = 2,
    num_parts: int = _SESSION_PARTS,
) -> "ray.data.Dataset":
    """Per-event moving sum of ``value`` over the frame ROWS ``preceding``
    PRECEDING..CURRENT, per user ordered by (ts, event_id) — the
    ordered-frame window aggregate (trend smoothing / rate features).

    ONE hash-partition shuffle on user_id (frames span batches), then
    every user of a partition in one vectorized pass: a cumulative sum
    with the frame start clamped to the user boundary — no Python loop
    per user or per row. Values sum as exact round(value*1000) int64
    'milli-units' so parallel order can't perturb float addition; the
    result divides once at the end.
    """

    def add_part(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        return t.append_column(
            "_p", pa.array(((u * _KNUTH) % np.uint64(num_parts)).astype(np.int32))
        )

    def per_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "user_id": pa.array([], pa.int64()),
                    "rolling_sum": pa.array([], pa.float64()),
                }
            )
        order, u, ts, eid = _user_sorted(t)
        v = t.column("value").to_numpy(zero_copy_only=False)[order]
        vm = np.round(v * 1000.0).astype(np.int64)
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        group = np.zeros(u.size, dtype=np.int64)
        group[starts] = 1
        group = np.cumsum(group) - 1
        cs = np.r_[0, np.cumsum(vm)]  # cs[i+1] = sum of rows 0..i
        i = np.arange(u.size)
        lo = np.maximum(i - preceding, starts[group])
        rs = cs[i + 1] - cs[lo]
        return pa.table(
            {
                "event_id": pa.array(eid),
                "user_id": pa.array(u),
                "rolling_sum": pa.array(rs.astype(np.float64) / 1000.0),
            }
        )

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("_p")
        .map_groups(per_part, batch_format="pyarrow")
    )


def rolling_median(
    ds: "ray.data.Dataset",
    preceding: int = 3,
    num_parts: int = _SESSION_PARTS,
) -> "ray.data.Dataset":
    """Per-event rolling MEDIAN of ``value`` over ROWS ``preceding``
    PRECEDING..CURRENT per user ordered by (ts, event_id) — the
    order-statistic window aggregate (robust smoothing; the sum's
    outlier-immune sibling).

    Same ONE user-keyed shuffle as :func:`rolling_sum`; per partition
    the frame is materialized as an (n, preceding+1) gather matrix with
    NaN padding beyond the user's first row and reduced with one
    ``np.nanmedian`` — no per-row Python. Even-count frames interpolate
    the two middle values with the same IEEE ``(a+b)/2`` DuckDB's
    median uses, so the gate compares doubles bit-exactly.
    """

    def add_part(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        return t.append_column(
            "_p", pa.array(((u * _KNUTH) % np.uint64(num_parts)).astype(np.int32))
        )

    def per_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "user_id": pa.array([], pa.int64()),
                    "rolling_median": pa.array([], pa.float64()),
                }
            )
        order, u, ts, eid = _user_sorted(t)
        v = t.column("value").to_numpy(zero_copy_only=False)[order]
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        group = np.zeros(u.size, dtype=np.int64)
        group[starts] = 1
        group = np.cumsum(group) - 1
        i = np.arange(u.size)
        lo = starts[group]
        # frame matrix: column d holds v[i-d], NaN where i-d < user start
        offs = np.arange(preceding + 1)
        idx = i[:, None] - offs[None, :]
        valid = idx >= lo[:, None]
        mat = np.where(valid, v[np.clip(idx, 0, None)], np.nan)
        med = np.nanmedian(mat, axis=1)
        return pa.table(
            {
                "event_id": pa.array(eid),
                "user_id": pa.array(u),
                "rolling_median": pa.array(med),
            }
        )

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("_p")
        .map_groups(per_part, batch_format="pyarrow")
    )


def event_gaps(
    ds: "ray.data.Dataset",
    num_parts: int = _SESSION_PARTS,
) -> "ray.data.Dataset":
    """Per-event lag: microseconds since the user's previous event
    (NULL for the first) — lag()/LEAD-family window coverage and the
    raw material for inter-arrival analyses. Same one-shuffle,
    vectorized-per-partition shape as :func:`sessionize`."""

    def add_part(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        return t.append_column(
            "_p", pa.array(((u * _KNUTH) % np.uint64(num_parts)).astype(np.int32))
        )

    def per_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "user_id": pa.array([], pa.int64()),
                    "gap_us": pa.array([], pa.int64()),
                }
            )
        order, u, ts, eid = _user_sorted(t)
        gaps = np.empty(u.size, dtype=np.int64)
        gaps[0] = 0
        gaps[1:] = ts[1:] - ts[:-1]
        first = np.r_[True, u[1:] != u[:-1]]
        return pa.table(
            {
                "event_id": pa.array(eid),
                "user_id": pa.array(u),
                "gap_us": pa.array(
                    np.ma.masked_array(gaps, mask=first), pa.int64(),
                    from_pandas=True,
                ),
            }
        )

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("_p")
        .map_groups(per_part, batch_format="pyarrow")
    )

def range_rolling(
    ds: "ray.data.Dataset",
    window_us: int = 3_600_000_000,
    num_parts: int = _SESSION_PARTS,
) -> "ray.data.Dataset":
    """Value-based window frame: per event, count + sum of ``value`` over
    the user's events with ``ts`` in ``[ts_i - window, ts_i]`` — SQL's
    ``RANGE BETWEEN INTERVAL .. PRECEDING AND CURRENT ROW`` (both frame
    ends by VALUE, so ts peers are included), which the row-frame
    :func:`rolling_sum` cannot express.

    ONE hash-partition shuffle on user_id, then every user of a
    partition in one vectorized pass. The frame bounds come from a
    single global ``np.searchsorted`` over a segment-shifted timestamp
    axis: each user's timestamps are translated onto disjoint
    monotonically increasing ranges (segment k starts at
    ``base_k + window``, where ``base_{k+1} = base_k + span_k + window
    + 1``), so one sorted array answers every per-user range probe —
    no Python dispatch per user. The shift domain is int64-guarded
    loudly (total span of a partition must fit), the same discipline
    as the temporal joins' overflow guard.
    """

    def add_part(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        return t.append_column(
            "_p", pa.array(((u * _KNUTH) % np.uint64(num_parts)).astype(np.int32))
        )

    w = np.int64(window_us)

    def per_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "user_id": pa.array([], pa.int64()),
                    "win_n": pa.array([], pa.int64()),
                    "win_sum": pa.array([], pa.float64()),
                }
            )
        order, u, ts, eid = _user_sorted(t)
        v = t.column("value").to_numpy(zero_copy_only=False)[order]
        vm = np.round(v * 1000.0).astype(np.int64)
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        ends = np.r_[starts[1:], u.size]
        group = np.zeros(u.size, dtype=np.int64)
        group[starts] = 1
        group = np.cumsum(group) - 1
        seg_min = ts[starts]
        spans = (ts[ends - 1] - seg_min).astype(np.float64)
        if (spans + float(w) + 1.0).sum() >= float(np.iinfo(np.int64).max):
            raise OverflowError(
                "range_rolling: partition time spans overflow the int64 "
                "shift domain; shrink window_us or raise num_parts"
            )
        bases = np.r_[0, np.cumsum((ts[ends - 1] - seg_min) + w + 1)[:-1]]
        shifted = (ts - seg_min[group]) + w + bases[group]
        lo = np.searchsorted(shifted, shifted - w, side="left")
        hi = np.searchsorted(shifted, shifted, side="right")
        cs = np.r_[0, np.cumsum(vm)]
        return pa.table(
            {
                "event_id": pa.array(eid),
                "user_id": pa.array(u),
                "win_n": pa.array(hi - lo),
                "win_sum": pa.array((cs[hi] - cs[lo]).astype(np.float64) / 1000.0),
            }
        )

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("_p")
        .map_groups(per_part, batch_format="pyarrow")
    )

def scd2_versions(
    ds: "ray.data.Dataset",
    num_parts: int = _SESSION_PARTS,
) -> "ray.data.Dataset":
    """Type-2 slowly-changing-dimension build: collapse each user's
    event stream into STATE VERSIONS — a new version opens only when
    ``event_type`` CHANGES (classic SCD2 change detection), carrying
    ``[valid_from_us, valid_to_us)`` validity bounds with NULL
    ``valid_to_us`` on the current version. The warehouse dimension
    maintenance shape (Kimball SCD type 2) as one Ray pipeline.

    ONE hash-partition shuffle on user_id; per partition everything is
    run-boundary vectorization over the (user, ts, event_id) order:
    shifted compare for the change mask, run-relative arange for the
    version number, a shifted take for the closing timestamp. Output is
    change-row-sized (<= input), nothing gathers driver-side.
    """

    def add_part(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        return t.append_column(
            "_p", pa.array(((u * _KNUTH) % np.uint64(num_parts)).astype(np.int32))
        )

    def per_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "version": pa.array([], pa.int64()),
                    "event_type": pa.array([], pa.string()),
                    "valid_from_us": pa.array([], pa.int64()),
                    "valid_to_us": pa.array([], pa.int64()),
                }
            )
        order, u, ts, _eid = _user_sorted(t)
        et = (
            t.column("event_type")
            .combine_chunks()
            .take(pa.array(order))
            .to_numpy(zero_copy_only=False)
        )
        first = np.r_[True, u[1:] != u[:-1]]
        change = first | np.r_[False, et[1:] != et[:-1]]
        ku, kts, ket = u[change], ts[change], et[change]
        # version = 1-based rank within the user's change rows
        kfirst = np.r_[True, ku[1:] != ku[:-1]]
        starts = np.flatnonzero(kfirst)
        runlen = np.diff(np.r_[starts, ku.size])
        version = np.arange(ku.size, dtype=np.int64) - np.repeat(starts, runlen) + 1
        # valid_to = next version's open ts within the same user, NULL on last
        valid_to = np.r_[kts[1:], np.int64(0)]
        last = np.r_[kfirst[1:], True]
        return pa.table(
            {
                "user_id": pa.array(ku),
                "version": pa.array(version),
                "event_type": pa.array(ket),
                "valid_from_us": pa.array(kts),
                "valid_to_us": pa.array(
                    np.ma.masked_array(valid_to, mask=last), pa.int64(),
                    from_pandas=True,
                ),
            }
        )

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("_p")
        .map_groups(per_part, batch_format="pyarrow")
    )


def multitouch_credits(
    ds: "ray.data.Dataset",
    window_us: int = 7 * 86_400_000_000,
    num_parts: int = _SESSION_PARTS,
) -> "ray.data.Dataset":
    """U-shaped multi-touch attribution (the ad-tech warehouse shape):
    every purchase distributes 10 000 basis points of credit over the
    same user's clicks in the preceding ``window_us`` (ts in
    [pt - w, pt), ordered by ts then event_id): one click takes all
    10 000; two take 5 000 each; three-plus give first and last 4 000
    each and split the remaining 2 000 over the middles by exact
    integer division, remainder to the first middle — so every credit
    is an exact int64 and per-click sums are order-free.

    ONE user-keyed shuffle (purchases and clicks of a user co-locate);
    per partition the click windows come from two segment-shifted
    searchsorted probes (the `range_rolling` axis trick, overflow-
    guarded) and the (purchase x click) expansion is the repeat/cumsum
    triangular indexing — no per-purchase Python. A click's total
    credit reduces inside its own partition; output is
    credited-click-sized."""

    def add_part(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        return t.append_column(
            "_p", pa.array(((u * _KNUTH) % np.uint64(num_parts)).astype(np.int32))
        )

    w = np.int64(window_us)

    def per_part(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "event_id": pa.array([], pa.int64()),
                "credit_bp": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        order, u, ts, eid = _user_sorted(t)
        kind = (
            t.column("event_type")
            .combine_chunks()
            .take(pa.array(order))
            .to_numpy(zero_copy_only=False)
        )
        # shared shifted axis over ALL rows (purchases + clicks), then
        # masked views — both sides must live on the same axis
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        ends = np.r_[starts[1:], u.size]
        group = np.zeros(u.size, dtype=np.int64)
        group[starts] = 1
        group = np.cumsum(group) - 1
        seg_min = ts[starts]
        spans = (ts[ends - 1] - seg_min).astype(np.float64)
        if (spans + float(w) + 1.0).sum() >= float(np.iinfo(np.int64).max):
            raise OverflowError(
                "multitouch_credits: partition time spans overflow the "
                "int64 shift domain; shrink window_us or raise num_parts"
            )
        bases = np.r_[0, np.cumsum((ts[ends - 1] - seg_min) + w + 1)[:-1]]
        shifted = (ts - seg_min[group]) + w + bases[group]

        is_c = kind == "click"
        is_p = kind == "purchase"
        cax, cid = shifted[is_c], eid[is_c]
        pax = shifted[is_p]
        if cax.size == 0 or pax.size == 0:
            return empty
        lo = np.searchsorted(cax, pax - w, side="left")
        hi = np.searchsorted(cax, pax, side="left")
        k = hi - lo
        total = int(k.sum())
        if total == 0:
            return empty
        pidx = np.repeat(np.arange(k.size), k)
        within = np.arange(total, dtype=np.int64) - np.repeat(
            np.r_[0, np.cumsum(k)[:-1]], k
        )
        cpos = lo[pidx] + within
        pos = within + 1
        kk = k[pidx]
        mid_div = 2000 // np.maximum(kk - 2, 1)
        mid_rem = 2000 % np.maximum(kk - 2, 1)
        credit = np.where(
            kk == 1,
            10_000,
            np.where(
                kk == 2,
                5_000,
                np.where(
                    (pos == 1) | (pos == kk),
                    4_000,
                    mid_div + np.where(pos == 2, mid_rem, 0),
                ),
            ),
        ).astype(np.int64)
        ids = cid[cpos]
        uniq, inv = np.unique(ids, return_inverse=True)
        sums = np.bincount(inv, weights=credit).astype(np.int64)
        return pa.table(
            {"event_id": pa.array(uniq), "credit_bp": pa.array(sums)}
        )

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("_p")
        .map_groups(per_part, batch_format="pyarrow")
    )


def session_paths(
    ds: "ray.data.Dataset",
    gap_minutes: int = 30,
    max_len: int = 5,
    num_parts: int = _SESSION_PARTS,
) -> "ray.data.Dataset":
    """(path, n_sessions): top-of-session navigation paths — each
    session's first ``max_len`` event types joined with ``>``
    (clickstream path mining). ONE user-keyed exchange; per partition
    every session is ENCODED, not string-built: event types map to
    small ints (the distinct-type list is a constant-sized broadcast),
    and a session's path becomes one base-(k+1) integer via a single
    ``np.bincount`` over positional digit weights — no Python loop per
    session. Only the DISTINCT path codes (<= (k+1)^max_len, a few
    thousand) are decoded back to strings in the final tiny pass, so
    string assembly never touches corpus-sized data.
    """
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    gap_us = np.int64(gap_minutes * 60_000_000)

    # constant-sized: the distinct event-type vocabulary (k values)
    types = sorted(
        r["event_type"]
        for r in ds.groupby("event_type").count().take_all()
    )
    base = len(types) + 1
    type_arr = pa.array(types, pa.string())

    def add_part(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        return t.append_column(
            "_p", pa.array(((u * _KNUTH) % np.uint64(num_parts)).astype(np.int32))
        )

    empty = pa.table(
        {
            "path_code": pa.array([], pa.int64()),
            "n_sessions": pa.array([], pa.int64()),
        }
    )

    def per_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        order, u, ts, eid = _user_sorted(t)
        code = (
            pc.index_in(t.column("event_type"), type_arr)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)[order]
        )
        user_start = np.r_[True, u[1:] != u[:-1]]
        gaps = np.empty(u.size, dtype=np.int64)
        gaps[0] = 0
        gaps[1:] = ts[1:] - ts[:-1]
        new_session = user_start | (gaps > gap_us)
        sid = np.cumsum(new_session) - 1
        sess_start = np.flatnonzero(new_session)[sid]
        pos = np.arange(u.size) - sess_start
        keep = pos < max_len
        w = (code[keep] + 1).astype(np.float64) * np.power(
            float(base), pos[keep].astype(np.float64)
        )
        codes = np.bincount(sid[keep], weights=w).astype(np.int64)
        g = (
            pa.table(
                {
                    "path_code": pa.array(codes),
                    "n_sessions": pa.array(np.ones(codes.size, dtype=np.int64)),
                }
            )
            .group_by("path_code")
            .aggregate([("n_sessions", "sum")])
        )
        return g.rename_columns(["path_code", "n_sessions"])

    def decode(t: pa.Table) -> pa.Table:
        paths = []
        for c in t.column("path_code").to_pylist():
            parts = []
            while c:
                c, d = divmod(c, base)
                parts.append(types[d - 1])
            paths.append(">".join(parts))
        return pa.table(
            {
                "path": pa.array(paths, pa.string()),
                "n_sessions": t.column("n_sessions"),
            }
        )

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("_p")
        .map_groups(per_part, batch_format="pyarrow")
        .groupby("path_code")
        .aggregate(Sum("n_sessions", alias_name="n_sessions"))
        .map_batches(decode, batch_format="pyarrow")
    )
