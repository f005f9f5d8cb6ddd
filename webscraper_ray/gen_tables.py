"""Scale-up replicator for the TPC-H-ish bench tables.

Synthesizes an sf×K input from an existing sf directory by concatenating
K copies of each fact table with FOREIGN-KEY-CONSISTENT id offsets
(copy k's o_custkey shifts by the same stride as customer's c_custkey,
lineitem follows orders/part/supplier, events keep per-user densities by
shifting user_id too). Dimension tables (region, nation) replicate once.

Purpose: the sf1 bench point (BASELINE.md §c) — the driver ships
sf{0.001,0.01,0.1}; a 10× input validates that the sized-read
fall-through and the size-gated join planner hold when the data
outgrows the small-input regime. Deterministic: pure arithmetic on the
source tables, no RNG.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

__all__ = ["scale_tables"]

# table -> {column: stride_source_table} ; stride = max(key)+1 of the SOURCE
_KEYED = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "events": {"event_id": "events", "user_id": "events:user_id"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}
_DIMS = ["region", "nation"]
_PRIMARY = {
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}


def scale_tables(src_dir: str, dst_dir: str, factor: int = 10) -> str:
    """Write ``factor``-times-replicated copies of the bench tables."""
    os.makedirs(dst_dir, exist_ok=True)
    strides: dict[str, int] = {}
    for tbl, key in _PRIMARY.items():
        t = pq.read_table(os.path.join(src_dir, f"{tbl}.parquet"), columns=[key])
        strides[tbl] = int(pc.max(t.column(key)).as_py()) + 1
    # events.user_id stride is its own max (user ids repeat across events)
    ut = pq.read_table(os.path.join(src_dir, "events.parquet"), columns=["user_id"])
    strides["events:user_id"] = int(pc.max(ut.column("user_id")).as_py()) + 1

    for tbl in _DIMS:
        pq.write_table(
            pq.read_table(os.path.join(src_dir, f"{tbl}.parquet")),
            os.path.join(dst_dir, f"{tbl}.parquet"),
        )
    for tbl, keymap in _KEYED.items():
        src = pq.read_table(os.path.join(src_dir, f"{tbl}.parquet"))
        copies = []
        for k in range(factor):
            t = src
            if k:
                for col, stride_src in keymap.items():
                    idx = t.column_names.index(col)
                    shifted = pc.add(
                        t.column(col), pa.scalar(k * strides[stride_src])
                    ).cast(t.schema.field(col).type)
                    t = t.set_column(idx, col, shifted)
            copies.append(t)
        pq.write_table(
            pa.concat_tables(copies), os.path.join(dst_dir, f"{tbl}.parquet")
        )
    return dst_dir
