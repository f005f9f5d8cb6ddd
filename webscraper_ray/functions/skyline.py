"""2-D skyline (Pareto frontier) — maximize both dimensions.

A row survives iff no other row is >= in BOTH dimensions and > in at
least one (exact duplicates of a skyline point all survive: neither
dominates the other). The distributed shape is the classic
local-prune → tiny-merge: every batch computes its LOCAL skyline with
one vectorized sort+cummax pass (a random batch's skyline is ~log n
points), and only those survivors — not the corpus — reach the single
final merge group, which reruns the same kernel. No full-data shuffle
at any corpus size; the only exchange is survivor-sized.

Dimensions are exact int64 (cents / epoch-µs), so dominance is
integer-exact and the result value-hash matches the SQL oracle's
window formulation (max-before cummax over the (x DESC, y DESC)
distinct-pair order).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

__all__ = ["skyline_mask", "skyline_2d"]


def skyline_mask(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Boolean mask of the maximize-(x, y) skyline, duplicates kept.

    Over DISTINCT pairs sorted by (x DESC, y DESC), a pair is dominated
    iff the running max of y over strictly-earlier pairs >= its own y
    (earlier pairs have x > x_i, or x == x_i with y > y_i — exactly the
    dominators). One ``np.unique`` + one exclusive cummax; rows map
    back through the inverse index, so exact duplicates share a fate.
    """
    pts = np.empty(x.size, dtype=[("x", np.int64), ("y", np.int64)])
    pts["x"], pts["y"] = x, y
    uniq, inv = np.unique(pts, return_inverse=True)
    # np.unique sorts ascending; traverse descending for the cummax
    ux = uniq["x"][::-1].copy()
    uy = uniq["y"][::-1].copy()
    # within equal x, descending order means y descending too
    mx_before = np.empty(uy.size, dtype=np.int64)
    if uy.size:
        mx_before[0] = np.iinfo(np.int64).min
        np.maximum.accumulate(uy[:-1], out=mx_before[1:])
    keep_desc = uy > mx_before
    keep_uniq = keep_desc[::-1]  # back to ascending-unique order
    return keep_uniq[inv]


def skyline_2d(
    ds: "ray.data.Dataset",
    x_col: str,
    y_col: str,
    out_cols: "list[str]",
) -> "ray.data.Dataset":
    """Rows of ``out_cols`` at the maximize-(x_col, y_col) skyline.

    ``x_col``/``y_col`` must already be exact int64 columns on ``ds``.
    """

    def local(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(
                "_g", pa.array([], pa.int32())
            )
        m = skyline_mask(
            t.column(x_col).to_numpy(zero_copy_only=False),
            t.column(y_col).to_numpy(zero_copy_only=False),
        )
        out = t.filter(pa.array(m))
        return out.append_column(
            "_g", pa.array(np.zeros(out.num_rows, dtype=np.int32))
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.select(out_cols)
        m = skyline_mask(
            t.column(x_col).to_numpy(zero_copy_only=False),
            t.column(y_col).to_numpy(zero_copy_only=False),
        )
        return t.filter(pa.array(m)).select(out_cols)

    return (
        ds.map_batches(local, batch_format="pyarrow")
        .groupby("_g")
        .map_groups(merge, batch_format="pyarrow")
    )
