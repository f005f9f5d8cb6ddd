"""Resumable partitioned-parquet export sink.

At 100 TB a sink must be RESTARTABLE: output lands as one directory per
partition value with a ``_SUCCESS`` marker written only after that
partition's data is durably on disk, so a failed run re-invoked with the
same arguments skips every finished partition and writes only the
missing ones (mirrors the reference's idempotent row-write semantics,
``src/db.ts`` upsert, at directory granularity). The partition column is
expected to be bounded-cardinality (source/lang/date-style); each
partition may still hold many row groups — the marker is per PARTITION,
not per file, because partition directories are the resume unit.

Scale shape: ONE distinct-values pass (partition-cardinality-sized
exchange) decides what is already done; the data pass filters finished
partitions with a vectorized mask BEFORE the single partition-keyed
exchange, so a 99%-finished resume reships ~1% of the corpus. Writes
happen inside the ``map_groups`` tasks (on a cluster this is shared
storage; the driver never sees data rows) and the returned manifest is
partition-cardinality-sized.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data

__all__ = ["export_partitioned", "finished_partitions"]

_SUCCESS = "_SUCCESS"


def finished_partitions(out_dir: str, partition_col: str) -> set[str]:
    """Partition values whose directories carry a ``_SUCCESS`` marker."""
    done: set[str] = set()
    prefix = f"{partition_col}="
    if not os.path.isdir(out_dir):
        return done
    for name in os.listdir(out_dir):
        if name.startswith(prefix) and os.path.exists(
            os.path.join(out_dir, name, _SUCCESS)
        ):
            done.add(name[len(prefix):])
    return done


def export_partitioned(
    ds: "ray.data.Dataset",
    out_dir: str,
    partition_col: str,
    num_parts: int | None = None,
) -> pa.Table:
    """Write ``ds`` as ``out_dir/<col>=<value>/part-*.parquet`` with a
    per-partition ``_SUCCESS`` marker; skip partitions already marked.

    Returns the manifest (partition value, n_rows, skipped flag) —
    partition-cardinality-sized. Skipped rows report the row count
    recorded in their marker, so the manifest is complete after a
    resume."""
    os.makedirs(out_dir, exist_ok=True)
    done = finished_partitions(out_dir, partition_col)

    if done:
        done_arr = pa.array(sorted(done), pa.string())
        ds = ds.map_batches(
            lambda t: t.filter(
                pc.invert(
                    pc.is_in(
                        pc.cast(t.column(partition_col), pa.string()),
                        value_set=done_arr,
                    )
                )
            ),
            batch_format="pyarrow",
        )

    def write_group(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    partition_col: pa.array([], pa.string()),
                    "n_rows": pa.array([], pa.int64()),
                    "skipped": pa.array([], pa.bool_()),
                }
            )
        val = str(t.column(partition_col)[0].as_py())
        pdir = os.path.join(out_dir, f"{partition_col}={val}")
        os.makedirs(pdir, exist_ok=True)
        pq.write_table(t, os.path.join(pdir, "part-0.parquet"))
        # marker LAST: its presence certifies the partition's data
        with open(os.path.join(pdir, _SUCCESS), "w") as f:
            json.dump({"n_rows": t.num_rows}, f)
        return pa.table(
            {
                partition_col: pa.array([val], pa.string()),
                "n_rows": pa.array([t.num_rows], pa.int64()),
                "skipped": pa.array([False]),
            }
        )

    written = ds.groupby(partition_col).map_groups(
        write_group, batch_format="pyarrow"
    )
    parts = [p for p in ray.get(written.to_arrow_refs()) if p.num_rows > 0]
    rows = (
        pa.concat_tables(parts)
        if parts
        else pa.table(
            {
                partition_col: pa.array([], pa.string()),
                "n_rows": pa.array([], pa.int64()),
                "skipped": pa.array([], pa.bool_()),
            }
        )
    )
    skipped_rows = []
    for val in sorted(done):
        with open(
            os.path.join(out_dir, f"{partition_col}={val}", _SUCCESS)
        ) as f:
            n = int(json.load(f)["n_rows"])
        skipped_rows.append((val, n))
    if skipped_rows:
        rows = pa.concat_tables(
            [
                rows,
                pa.table(
                    {
                        partition_col: pa.array(
                            [v for v, _ in skipped_rows], pa.string()
                        ),
                        "n_rows": pa.array(
                            [n for _, n in skipped_rows], pa.int64()
                        ),
                        "skipped": pa.array([True] * len(skipped_rows)),
                    }
                ),
            ]
        )
    # deterministic manifest order
    idx = pc.sort_indices(rows, sort_keys=[(partition_col, "ascending")])
    return rows.take(idx)
