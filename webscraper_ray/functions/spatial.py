"""Spatial radius join via grid bucketing (the classic "partition-based
spatial merge join", Patel & DeWitt SIGMOD'96, in its L-infinity form so
the predicate — and therefore the oracle — is exactly integer).

Finds all pairs (a, b), a.id < b.id, with |ax-bx| <= r AND |ay-by| <= r.

Scale shape:
- every point lands in ONE home cell of side r; additionally each point
  is REPLICATED to its 3x3 neighbor cells as a probe copy (constant 9x
  fan-out of 32-B rows — never a cross join);
- ONE cell-keyed shuffle; within a cell, pairs are (home point a) x
  (probe copy b) with b.id > a.id — any qualifying pair has
  |cell(a)-cell(b)| <= 1 per axis, so b's probe copy is guaranteed
  present in a's home cell, and ONLY a's home cell emits it: each pair
  is produced exactly once with no global dedup pass;
- per-cell work is |home| x |probes| on cell-local arrays (uniform
  points: (n / cells) ** 2 — the operator's documented skew caveat is a
  single overloaded cell, the standard spatial-join hot-spot).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

__all__ = ["grid_radius_join"]


def grid_radius_join(
    pts: "ray.data.Dataset",
    radius: int,
    id_col: str = "doc_id",
    x_col: str = "x",
    y_col: str = "y",
) -> "ray.data.Dataset":
    """All pairs within L-inf ``radius``: (a, b, adx, ady), a < b."""
    if radius <= 0:
        raise ValueError("radius must be positive")
    cell = radius  # side = r guarantees neighbors live within 3x3 cells

    def emit(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        x = t.column(x_col).to_numpy(zero_copy_only=False).astype(np.int64)
        y = t.column(y_col).to_numpy(zero_copy_only=False).astype(np.int64)
        cx, cy = x // cell, y // cell
        out_cell, out_id, out_x, out_y, out_probe = [], [], [], [], []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                ncx, ncy = cx + dx, cy + dy
                ok = (ncx >= 0) & (ncy >= 0)
                key = ncx[ok] * np.int64(1 << 20) + ncy[ok]
                out_cell.append(key)
                out_id.append(ids[ok])
                out_x.append(x[ok])
                out_y.append(y[ok])
                # the (0,0) copy IS the home row; every point appears in
                # a given cell at most once across the 9 offsets
                flag = 0 if (dx == 0 and dy == 0) else 1
                out_probe.append(np.full(int(ok.sum()), flag, np.int8))
        return pa.table(
            {
                "_cell": pa.array(np.concatenate(out_cell)),
                "pid": pa.array(np.concatenate(out_id)),
                "x": pa.array(np.concatenate(out_x)),
                "y": pa.array(np.concatenate(out_y)),
                "probe": pa.array(np.concatenate(out_probe)),
            }
        )

    def join_cell(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "adx": pa.array([], pa.int64()),
                "ady": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        probe = t.column("probe").to_numpy(zero_copy_only=False)
        ids = t.column("pid").to_numpy(zero_copy_only=False)
        x = t.column("x").to_numpy(zero_copy_only=False)
        y = t.column("y").to_numpy(zero_copy_only=False)
        home = probe == 0
        ha, hx, hy = ids[home], x[home], y[home]
        if ha.size == 0 or ids.size == 0:
            return empty
        # candidates: home a x ALL copies b in this cell (home rows are
        # their own cell's probe copies), b.id > a.id bounds each pair
        # to exactly one emission
        dx = np.abs(hx[:, None] - x[None, :])
        dy = np.abs(hy[:, None] - y[None, :])
        hit = (dx <= radius) & (dy <= radius) & (ha[:, None] < ids[None, :])
        ai, bi = np.nonzero(hit)
        return pa.table(
            {
                "a": pa.array(ha[ai]),
                "b": pa.array(ids[bi]),
                "adx": pa.array(dx[ai, bi]),
                "ady": pa.array(dy[ai, bi]),
            }
        )

    return (
        pts.map_batches(emit, batch_format="pyarrow")
        .groupby("_cell")
        .map_groups(join_cell, batch_format="pyarrow")
    )
