"""Max-min fair crawl-budget allocation (water-filling) — the frontier
scheduler's admission-control step: given a global fetch budget ``B``
and per-host demands, every host gets ``min(demand, L)`` where the fair
level ``L`` solves ``sum min(d_h, L) = B`` (progressive filling; the
classic max-min fairness definition, Bertsekas & Gallager, *Data
Networks* §6.5.2). Integer version: the residual after the level is
distributed one-each to the smallest unsaturated hosts in
``(demand, source)`` order, so the allocation is exactly deterministic
and an ANSI window-function oracle can replay it.

Scale shape (H = distinct hosts, V = distinct demand VALUES):
- per-host demands: one groupby — H rows, distributed, never gathered;
- the level needs only the demand-value HISTOGRAM: a V-row gather (the
  ``exact_quantiles`` value-count discipline — demands are doc counts,
  so V is bounded by the max docs/host, vastly smaller than H; loudly
  guarded, never silently corpus-sized);
- the driver solves the waterline over V rows and broadcasts
  ``(L, k_v)`` — control-sized;
- the residual +1 ranking sorts ONLY the single demand-value group the
  waterline cuts through (``k_v`` is 0 or the full group everywhere
  else, no ordering needed) — documented single-group cost, the same
  shape as a boundary bucket in the exact-quantile split.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data
from ray.data.aggregate import Count, Sum

__all__ = ["budget_waterfill"]

MAX_DISTINCT_DEMANDS = 100_000


def budget_waterfill(
    ds: "ray.data.Dataset",
    budget: int,
    host_col: str = "source",
    max_distinct: int = MAX_DISTINCT_DEMANDS,
) -> "ray.data.Dataset":
    """(source, demand, alloc) — max-min fair integer allocation of
    ``budget`` fetch slots across hosts, demand = rows per host."""
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")

    demands = ds.groupby(host_col).aggregate(Count(alias_name="demand"))

    # demand-value histogram: V rows, guarded gather
    def hist_partial(t: pa.Table) -> pa.Table:
        g = t.group_by("demand").aggregate([("demand", "count")])
        return g.rename_columns(["demand", "n_hosts"])

    hist = (
        demands.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("demand")
        .aggregate(Sum("n_hosts", alias_name="n_hosts"))
    )
    vals, counts = [], []
    for b in hist.iter_batches(batch_format="pyarrow"):
        vals.extend(b.column("demand").to_pylist())
        counts.extend(b.column("n_hosts").to_pylist())
        if len(vals) > max_distinct:
            raise ValueError(
                f"budget_waterfill: > {max_distinct} distinct demand values "
                "— the histogram gather would not be bounded; raise "
                "max_distinct explicitly if the host population needs it"
            )
    order = np.argsort(np.asarray(vals, dtype=np.int64))
    v = np.asarray(vals, dtype=np.int64)[order]
    c = np.asarray(counts, dtype=np.int64)[order]
    h_total = int(c.sum())
    csum_hosts = np.concatenate([[0], np.cumsum(c)])  # hosts with demand < v_i
    csum_mass = np.concatenate([[0], np.cumsum(v * c)])  # their demand mass

    # a host of demand v_i is saturated iff giving v_i to every host of
    # demand >= v_i still fits the budget (monotone in v — the standard
    # water-filling fixed point)
    fits = csum_mass[:-1] + v * (h_total - csum_hosts[:-1]) <= budget
    n_sat_vals = int(fits.sum())  # fits is a monotone prefix
    if n_sat_vals and not fits[:n_sat_vals].all():
        raise AssertionError("waterfill saturation predicate not monotone")
    s = int(csum_hosts[n_sat_vals])  # saturated host count
    p_s = int(csum_mass[n_sat_vals])  # their total demand
    if s >= h_total:
        level = None  # budget covers every demand
        plus_per_val: dict[int, int] = {}
    else:
        level = (budget - p_s) // (h_total - s)
        resid = (budget - p_s) - level * (h_total - s)
        plus_per_val = {}
        for i in range(n_sat_vals, len(v)):
            if resid <= 0:
                break
            k = min(resid, int(c[i]))
            plus_per_val[int(v[i])] = k
            resid -= k

    def assign(group: pa.Table) -> pa.Table:
        dem = group.column("demand").to_numpy(zero_copy_only=False)
        d_val = int(dem[0])
        n = len(dem)
        if level is None or d_val <= level:
            alloc = dem.astype(np.int64)
        else:
            alloc = np.full(n, level, dtype=np.int64)
            k = plus_per_val.get(d_val, 0)
            if 0 < k < n:
                # the waterline cuts through this value group: the k
                # lexicographically-smallest sources get the +1
                src = np.asarray(group.column(host_col).to_pylist())
                alloc[np.argsort(src, kind="stable")[:k]] += 1
            elif k >= n:
                alloc += 1
        return pa.table(
            {
                host_col: group.column(host_col),
                "demand": pa.array(dem.astype(np.int64)),
                "alloc": pa.array(alloc),
            }
        )

    return demands.groupby("demand").map_groups(assign, batch_format="pyarrow")
