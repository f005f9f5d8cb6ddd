"""Z-order (Morton) layout — multi-dimensional clustering for pruning.

The warehouse mechanism behind ``OPTIMIZE ZORDER`` (Delta/Iceberg,
public docs; Morton order itself is 1966 public literature): quantize
two columns onto a 16-bit grid, bit-interleave into a 32-bit z-value,
and lay the data out bucketed by z-range. Because the curve preserves
2-D locality, each bucket's (x, y) min/max box is TIGHT, so a
two-dimensional range probe can discard whole buckets from their
footer stats — file pruning on BOTH columns at once, which no
single-column sort layout provides.

Everything is exact integer arithmetic (quantization is
``(v - min) * 65535 // span``), so the z-values are value-hash
reproducible in SQL with a generated shift/mask expression.

Scale shape: one tiny global min/max aggregate, one streaming
map_batches to stamp z-values, one range-partitioned write keyed on
the z-value's top bits (no global sort — bucket boundaries are fixed
bit prefixes). The probe reads footer stats + matching buckets only
(spy-pinned in tests, the `ann` store discipline).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

import ray.data

__all__ = ["spread16", "zvalue", "add_zvalues", "zorder_write", "zrange_probe"]

_M1 = np.uint32(0x0000FFFF)


def spread16(v: np.ndarray) -> np.ndarray:
    """Spread the low 16 bits of each uint32 to even bit positions —
    the classic mask-shift Morton expansion."""
    v = v.astype(np.uint32) & _M1
    v = (v | (v << np.uint32(8))) & np.uint32(0x00FF00FF)
    v = (v | (v << np.uint32(4))) & np.uint32(0x0F0F0F0F)
    v = (v | (v << np.uint32(2))) & np.uint32(0x33333333)
    v = (v | (v << np.uint32(1))) & np.uint32(0x55555555)
    return v


def zvalue(qx: np.ndarray, qy: np.ndarray) -> np.ndarray:
    """Interleave two 16-bit quantized dims into the 32-bit z-value
    (x on even bits, y on odd)."""
    return (spread16(qx) | (spread16(qy) << np.uint32(1))).astype(np.int64)


def _quant(v: np.ndarray, vmin: int, vmax: int) -> np.ndarray:
    # divide-by-width (never multiply-first: value*65535 overflows int64
    # on epoch-µs spans); width = span//65536 + 1 keeps q in [0, 65535]
    w = (int(vmax) - int(vmin)) // 65536 + 1
    return ((v.astype(np.int64) - int(vmin)) // w).astype(np.uint32)


def add_zvalues(
    ds: "ray.data.Dataset",
    x_col: str,
    y_col: str,
    bounds: "tuple[int, int, int, int]",
) -> "ray.data.Dataset":
    """Append ``zval`` from exact int64 columns ``x_col``/``y_col``
    quantized against the given global (xmin, xmax, ymin, ymax)."""
    xmin, xmax, ymin, ymax = bounds

    def stamp(t: pa.Table) -> pa.Table:
        qx = _quant(t.column(x_col).to_numpy(zero_copy_only=False), xmin, xmax)
        qy = _quant(t.column(y_col).to_numpy(zero_copy_only=False), ymin, ymax)
        return t.append_column("zval", pa.array(zvalue(qx, qy)))

    return ds.map_batches(stamp, batch_format="pyarrow")


def global_bounds(
    ds: "ray.data.Dataset", x_col: str, y_col: str
) -> "tuple[int, int, int, int]":
    """One tiny aggregate: global min/max of both dims (4 scalars to
    the driver — constant-sized at any corpus scale)."""
    from ray.data.aggregate import Max, Min

    r = ds.aggregate(Min(x_col), Max(x_col), Min(y_col), Max(y_col))
    return (
        int(r[f"min({x_col})"]),
        int(r[f"max({x_col})"]),
        int(r[f"min({y_col})"]),
        int(r[f"max({y_col})"]),
    )


def zorder_write(
    ds: "ray.data.Dataset",
    x_col: str,
    y_col: str,
    out_dir: str,
    bucket_bits: int = 4,
) -> "tuple[int, int, int, int]":
    """Write ``bucket=K/`` partitions keyed on the z-value's top
    ``bucket_bits`` bits (fixed bit-prefix boundaries — NO global
    sort/shuffle; rows of a bucket co-locate because the write is
    partitioned on the stamped column), plus a per-bucket (x, y)
    min/max stats file the probe prunes with. Returns the bounds used."""
    bounds = global_bounds(ds, x_col, y_col)
    # bucket on the OCCUPIED z-domain: spreads live on disjoint (even /
    # odd) bit positions, so z <= spread(qx_max) + 2*spread(qy_max) is a
    # tight, attained bound — a fixed 32-bit prefix would collapse every
    # row into bucket 0 whenever the value spans are narrow
    xmin, xmax, ymin, ymax = bounds
    qx_max = _quant(np.array([xmax], dtype=np.int64), xmin, xmax)
    qy_max = _quant(np.array([ymax], dtype=np.int64), ymin, ymax)
    z_ub = int(zvalue(qx_max, qy_max)[0])
    shift = max(0, z_ub.bit_length() - bucket_bits)
    z = add_zvalues(ds, x_col, y_col, bounds)

    def stamp_bucket(t: pa.Table) -> pa.Table:
        zv = t.column("zval").to_numpy(zero_copy_only=False)
        return t.append_column("bucket", pa.array(zv >> shift))

    z.map_batches(stamp_bucket, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["bucket"]
    )

    # per-bucket stats from the written footers (no second data pass)
    import pyarrow.parquet as pq

    rows = []
    for bdir in sorted(os.listdir(out_dir)):
        if not bdir.startswith("bucket="):
            continue
        bid = int(bdir.split("=")[1])
        xs_min, xs_max, ys_min, ys_max = [], [], [], []
        for f in os.listdir(os.path.join(out_dir, bdir)):
            if not f.endswith(".parquet"):
                continue
            md = pq.read_metadata(os.path.join(out_dir, bdir, f))
            sch = md.schema.to_arrow_schema()
            xi = sch.get_field_index(x_col)
            yi = sch.get_field_index(y_col)
            for rg in range(md.num_row_groups):
                xs = md.row_group(rg).column(xi).statistics
                ys = md.row_group(rg).column(yi).statistics
                xs_min.append(xs.min)
                xs_max.append(xs.max)
                ys_min.append(ys.min)
                ys_max.append(ys.max)
        if xs_min:
            rows.append(
                (bid, min(xs_min), max(xs_max), min(ys_min), max(ys_max))
            )
    cols = list(zip(*rows)) if rows else [[], [], [], [], []]
    pq.write_table(
        pa.table(
            {
                "bucket": pa.array(cols[0], pa.int64()),
                "x_min": pa.array(cols[1], pa.int64()),
                "x_max": pa.array(cols[2], pa.int64()),
                "y_min": pa.array(cols[3], pa.int64()),
                "y_max": pa.array(cols[4], pa.int64()),
            }
        ),
        os.path.join(out_dir, "_bucket_stats.parquet"),
    )
    return bounds


def zrange_probe(
    store_dir: str,
    x_col: str,
    y_col: str,
    x_range: "tuple[int, int]",
    y_range: "tuple[int, int]",
) -> "ray.data.Dataset":
    """2-D range query over the z-ordered store: buckets whose stats box
    misses the query box are never read (file-level pruning on BOTH
    dims). Returns the matching rows."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    stats = pq.read_table(os.path.join(store_dir, "_bucket_stats.parquet"))
    keep = [
        int(b)
        for b, x0, x1, y0, y1 in zip(
            *(stats.column(c).to_pylist()
              for c in ("bucket", "x_min", "x_max", "y_min", "y_max"))
        )
        if not (x1 < x_range[0] or x0 > x_range[1]
                or y1 < y_range[0] or y0 > y_range[1])
    ]
    if not keep:
        return ray.data.from_arrow(stats.slice(0, 0))
    paths = [
        os.path.join(store_dir, f"bucket={b}") for b in keep
        if os.path.isdir(os.path.join(store_dir, f"bucket={b}"))
    ]
    ds = ray.data.read_parquet(paths)

    def final(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(
                pc.greater_equal(t.column(x_col), pa.scalar(x_range[0])),
                pc.less_equal(t.column(x_col), pa.scalar(x_range[1])),
            ),
            pc.and_(
                pc.greater_equal(t.column(y_col), pa.scalar(y_range[0])),
                pc.less_equal(t.column(y_col), pa.scalar(y_range[1])),
            ),
        )
        return t.filter(m)

    return ds.map_batches(final, batch_format="pyarrow")
