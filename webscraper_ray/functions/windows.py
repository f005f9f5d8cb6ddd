"""Stream-shaped operators over the ``events`` log (ray_guide §streaming).

Ray Data has no event-time windows; the batch equivalents treat events as
an ordered, user-partitioned log: ``groupby(user_id).map_groups`` sorts
each group by ts and applies the windowing in pandas. The ordering
assumption (per-key ts order inside the group) is established by the
sort inside the group fn, never globally.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray.data

__all__ = ["tumbling_counts", "hopping_counts", "sessionize"]


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


def sessionize(ds: "ray.data.Dataset", gap_minutes: int = 30) -> "ray.data.Dataset":
    """(user_id, n_sessions, n_events): sessions split on > gap idle time.

    groupby(user_id) shuffles once on the natural partition key; each
    group is sorted by ts locally. Matches the SQL lag()/sum() session
    construction in the oracle.
    """
    gap = pd.Timedelta(minutes=gap_minutes)

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts")
        new_session = (g["ts"].diff() > gap) | g["ts"].diff().isna()
        return pd.DataFrame(
            {
                "user_id": [g["user_id"].iloc[0]],
                "n_sessions": [int(new_session.sum())],
                "n_events": [len(g)],
            }
        )

    return ds.groupby("user_id").map_groups(per_user, batch_format="pandas")
