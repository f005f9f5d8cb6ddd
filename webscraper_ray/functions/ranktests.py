"""Exact two-sample rank statistics — Kolmogorov–Smirnov D and
Mann–Whitney U — as ONE distributed ordered-prefix-sum pass.

The data-drift / A-B staples that need the ORDER of the pooled sample,
not just group aggregates: D = sup_x |F1(x) - F2(x)| and the tie-aware
rank-sum U. Both reduce to cumulative class counts over the sorted
distinct values, so the engine computes them with the same two-pass
bucket prefix-sum the sequence packer uses (:mod:`.packing`):

1. per-batch partials: distinct ``(bucket, v, c1, c2)`` rows
   (``bucket = v // bucket_w``) — the only thing shipped;
2. bucket totals gather driver-side (VALUE-DOMAIN/bucket_w rows — the
   loud bounded-gather contract, like ``stats.exact_quantiles``) and an
   exclusive cumsum becomes the broadcast bucket-offset map;
3. one bucket-keyed ``map_groups``: per-value aggregation + local
   cumsum + the bucket's global offset; each bucket emits ONE partial
   (its max |s1*n2 - s2*n1| and its U contribution) — output is
   bucket-count rows reduced to a single row.

Everything is int64-exact: the KS numerator |s1*n2 - s2*n1| avoids the
ECDF division entirely (the single float in the output is one terminal
division, rounded to 6), and U is carried as 2*ranksum so tie-average
half-ranks stay integral. Int64 headroom is guarded loudly:
``n1 * (2n + 1)`` and ``n1 * n2`` must fit, which holds to ~2e9 rows
per side — beyond that the operator refuses rather than wraps
(the ``joins`` overflow-guard discipline).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

__all__ = ["two_sample_rank_stats", "BUCKET_W", "MAX_BUCKET_GATHER"]

BUCKET_W = 1 << 16  # cents per prefix-sum bucket
MAX_BUCKET_GATHER = 2_000_000  # loud bound on the driver-side bucket table


def two_sample_rank_stats(
    ds: "ray.data.Dataset",
    value_col: str = "v",
    c1_col: str = "c1",
    c2_col: str = "c2",
    bucket_w: int = BUCKET_W,
    max_buckets: int = MAX_BUCKET_GATHER,
) -> "ray.data.Dataset":
    """One row: (n1, n2, ks_num, ks_d, u2) for the two integer-valued
    samples flagged by ``c1_col``/``c2_col`` (0/1 indicator columns over
    a pooled dataset; ``value_col`` int64, e.g. exact cents).

    ``ks_num = max_v |S1(v)*n2 - S2(v)*n1|`` (cumulative counts S),
    ``ks_d = round(ks_num / (n1*n2), 6)``, ``u2 = 2 * R1`` where R1 is
    sample 1's tie-averaged rank sum (Mann–Whitney follows as
    ``U1 = R1 - n1(n1+1)/2``, kept exact by the caller)."""

    def partials(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64)
        c1 = batch.column(c1_col).to_numpy(zero_copy_only=False).astype(np.int64)
        c2 = batch.column(c2_col).to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, inv = np.unique(v, return_inverse=True)
        s1 = np.zeros(len(uniq), dtype=np.int64)
        s2 = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(s1, inv, c1)
        np.add.at(s2, inv, c2)
        return pa.table(
            {
                "bucket": pa.array(uniq // bucket_w, pa.int64()),
                "v": pa.array(uniq, pa.int64()),
                "c1": pa.array(s1, pa.int64()),
                "c2": pa.array(s2, pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    part_ds = ds.map_batches(partials, batch_format="pyarrow").materialize()
    # materialize: consumed twice (guard count + the offset gather) —
    # lazy, the groupby-Sum would re-execute for the second consumer
    bucket_tbl = (
        part_ds.groupby("bucket")
        .aggregate(Sum("c1", alias_name="c1"), Sum("c2", alias_name="c2"))
        .materialize()
    )
    n_buckets = bucket_tbl.count()
    if n_buckets > max_buckets:
        raise ValueError(
            f"two_sample_rank_stats: {n_buckets} value buckets "
            f"(> {max_buckets}); widen bucket_w so the driver-side "
            "offset table stays bounded."
        )
    bk, b1, b2 = [], [], []
    for b in bucket_tbl.iter_batches(batch_format="pyarrow"):
        bk.extend(b.column("bucket").to_pylist())
        b1.extend(b.column("c1").to_pylist())
        b2.extend(b.column("c2").to_pylist())
    order = np.argsort(np.asarray(bk, dtype=np.int64))
    bk_s = np.asarray(bk, dtype=np.int64)[order]
    b1_s = np.asarray(b1, dtype=np.int64)[order]
    b2_s = np.asarray(b2, dtype=np.int64)[order]
    n1 = int(b1_s.sum())
    n2 = int(b2_s.sum())
    n = n1 + n2
    # int64 headroom guards (Python ints, exact): refuse, never wrap
    if n1 * (2 * n + 1) >= 2**63 or n1 * n2 >= 2**63 or n2 * (2 * n + 1) >= 2**63:
        raise OverflowError(
            f"two_sample_rank_stats: n1={n1}, n2={n2} exceed int64 "
            "rank-sum headroom (~2e9 rows/side)"
        )
    off1 = np.concatenate([[0], np.cumsum(b1_s)[:-1]])
    off2 = np.concatenate([[0], np.cumsum(b2_s)[:-1]])
    offsets_ref = ray.put(
        {int(b): (int(o1), int(o2)) for b, o1, o2 in zip(bk_s, off1, off2)}
    )

    def bucket_reduce(group: pa.Table) -> pa.Table:
        offs = ray.get(offsets_ref)
        v = group.column("v").to_numpy(zero_copy_only=False)
        c1 = group.column("c1").to_numpy(zero_copy_only=False)
        c2 = group.column("c2").to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(v, return_inverse=True)
        s1 = np.zeros(len(uniq), dtype=np.int64)
        s2 = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(s1, inv, c1)
        np.add.at(s2, inv, c2)
        o1, o2 = offs[int(uniq[0] // bucket_w)]
        cum1 = o1 + np.cumsum(s1)  # S1 inclusive at each distinct v
        cum2 = o2 + np.cumsum(s2)
        ks = np.abs(cum1 * n2 - cum2 * n1).max() if len(uniq) else 0
        before = (cum1 - s1) + (cum2 - s2)  # pooled count strictly below v
        u2_part = int((s1 * (2 * before + (s1 + s2) + 1)).sum())
        return pa.table(
            {
                "ks_part": pa.array([int(ks)], pa.int64()),
                "u2_part": pa.array([u2_part], pa.int64()),
            }
        )

    from ray.data.aggregate import Max
    from ray.data.aggregate import Sum as _Sum

    red = (
        part_ds.groupby("bucket")
        .map_groups(bucket_reduce, batch_format="pyarrow")
        .aggregate(Max("ks_part", alias_name="ks"), _Sum("u2_part", alias_name="u2"))
    )
    ks_num = int(red["ks"]) if red["ks"] is not None else 0
    u2 = int(red["u2"]) if red["u2"] is not None else 0
    ks_d = round(ks_num / (n1 * n2), 6) if n1 and n2 else 0.0
    return ray.data.from_arrow(
        pa.table(
            {
                "n1": pa.array([n1], pa.int64()),
                "n2": pa.array([n2], pa.int64()),
                "ks_num": pa.array([ks_num], pa.int64()),
                "ks_d": pa.array([ks_d], pa.float64()),
                "u2": pa.array([u2], pa.int64()),
            }
        )
    )
