"""Incremental aggregate maintenance — the 100-TB "daily delta" pattern.

A running per-group aggregate (count + exact-integer sum) is persisted
as a group-count-sized parquet STATE; absorbing a new delta scans ONLY
the delta rows plus that state — never the historical corpus. At 100 TB
base + GB-scale daily increments this turns a full recompute into a
delta-sized job: the state is the algebraic combine form (counts and
int64 milli-sums commute and associate), so merge = union + one tiny
groupby over (groups-in-state + groups-in-delta) rows.

Float sums are carried as exact ``round(value*1000)`` int64 milli-units
the whole way (the repo-wide discipline), so the incremental chain is
value-hash identical to a from-scratch SQL aggregate over base ∪ delta.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

__all__ = ["agg_state", "build_agg_state", "merge_agg_state"]

_STATE_SCHEMA = ["event_type", "n_events", "value_milli"]


def agg_state(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """(event_type, n_events, value_milli): the combine-form aggregate.
    Pre-aggregated per batch, so the one shuffle carries a row per
    (group, batch), never per event."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        vm = pc.round(pc.multiply(t.column("value"), pa.scalar(1000.0))).cast(
            pa.int64()
        )
        tt = pa.table(
            {
                "event_type": t.column("event_type"),
                "n_events": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                "value_milli": vm,
            }
        )
        g = tt.group_by("event_type").aggregate(
            [("n_events", "sum"), ("value_milli", "sum")]
        )
        return g.rename_columns(_STATE_SCHEMA)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("value_milli", alias_name="value_milli"),
        )
    )


def build_agg_state(ds: "ray.data.Dataset", out_dir: str) -> None:
    """Persist the combine-form state (group-count-sized parquet)."""
    agg_state(ds).write_parquet(out_dir)


def merge_agg_state(
    state_dir: str, delta: "ray.data.Dataset"
) -> "ray.data.Dataset":
    """Updated aggregate from the persisted state + the delta ONLY.

    The base corpus is unreachable from here by construction — the
    merge's inputs are the state parquet and the delta Dataset, so the
    scan cost is O(delta + groups), not O(base).
    """
    from ray.data.aggregate import Sum

    merged = (
        ray.data.read_parquet(state_dir)
        .select_columns(_STATE_SCHEMA)
        .union(agg_state(delta))
        .groupby("event_type")
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("value_milli", alias_name="value_milli"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "n_events": t.column("n_events"),
                "sum_value": pc.divide(
                    t.column("value_milli").cast(pa.float64()), 1000.0
                ),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow")
