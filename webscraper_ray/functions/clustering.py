"""Embedding k-means (Lloyd's, fixed iterations) — deterministic enough
to be value-hash gated in SQL.

Clustering an embedding column (topic balancing, cluster-based dedup and
sampling) is iterative and float-heavy — normally impossible to gate
exactly, because parallel float sums are order-dependent. This
implementation makes every step order-independent and
SQL-reproducible:

- embeddings quantize ONCE to int64 (``round_half_away(x * 1e6)`` after
  a float64 cast — DuckDB's ``round()`` is half-away-from-zero, numpy's
  is half-to-even, so the helper implements the SQL convention);
- assignment is exact integer squared-L2 (diffs ≤ 2e6 → Σ of 64 squares
  ≤ 2.6e14, safely inside int64), ties to the LOWEST cluster index
  (numpy argmin-first == SQL ``row_number() OVER (ORDER BY dist, cl)``);
- centroid update sums int64 per (cluster, dim) — order-independent —
  and re-quantizes as ``round_half_away(sum / count)`` (float64 division
  of ints < 2^53 is exact, so both sides compute the identical value);
- init = the k smallest ids' vectors, a k-row driver gather.

Shape per iteration: broadcast the (k × d) centroid table via the
closure, ONE pass of ``map_batches`` emitting long-format partials
(cluster, dim, partial-sum) — k×(d+1) rows per block — then a
``groupby(cluster, dim).sum`` whose output (k×(d+1) rows total) is the
only driver gather. The embedding table is materialized once after
quantization: an iterative algorithm re-reads its working set every
pass, and the object store spills it rather than re-decoding parquet.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data
from ray.data.aggregate import Sum

__all__ = ["QUANT", "kmeans_clusters", "kmeans_fit", "round_half_away"]

QUANT = 1_000_000


def round_half_away(v: np.ndarray) -> np.ndarray:
    """DuckDB's round(): half away from zero (numpy rounds half to even)."""
    return np.where(v >= 0, np.floor(v + 0.5), np.ceil(v - 0.5))


def _quant_matrix(col: pa.ChunkedArray, quant: int = QUANT) -> np.ndarray:
    # list<float> -> (n, d) float64 -> quantized int64; the ONE shared
    # quantize kernel (k-means at QUANT, the perceptron at its coarser
    # scale) so sliced-array/null handling has a single home
    flat = col.combine_chunks()
    n = len(flat)
    d = len(flat[0]) if n else 0
    x = np.asarray(flat.values, dtype=np.float64).reshape(n, d)
    return round_half_away(x * quant).astype(np.int64)


def _assign(xq: np.ndarray, cents: np.ndarray) -> np.ndarray:
    # exact integer squared-L2; argmin takes the first (lowest) cluster
    diff = xq[:, None, :] - cents[None, :, :]
    return np.argmin((diff * diff).sum(axis=2), axis=1).astype(np.int32)


def kmeans_clusters(
    ds: "ray.data.Dataset",
    *,
    k: int = 4,
    iters: int = 3,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> "ray.data.Dataset":
    """(id, cluster) after ``iters`` Lloyd iterations — see
    :func:`kmeans_fit`, which additionally returns the centroids."""
    return kmeans_fit(
        ds, k=k, iters=iters, id_col=id_col, emb_col=emb_col
    )[0]


def kmeans_fit(
    ds: "ray.data.Dataset",
    *,
    k: int = 4,
    iters: int = 3,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> tuple["ray.data.Dataset", np.ndarray]:
    """((id, cluster) Dataset, final quantized centroids (k, d) int64)
    after ``iters`` Lloyd iterations from the k-smallest-id init. Empty
    clusters keep their previous centroid (and the SQL oracle encodes the
    same rule)."""

    def quantize(t: pa.Table) -> pa.Table:
        xq = _quant_matrix(t.column(emb_col))
        return pa.table(
            {
                id_col: t.column(id_col),
                "q": pa.array(list(xq), pa.list_(pa.int64())),
            }
        )

    qds = ds.map_batches(quantize, batch_format="pyarrow").materialize()

    # init: the k smallest ids' quantized vectors (k-row gather)
    head = qds.sort(id_col).limit(k).to_pandas()
    if head.empty:  # empty corpus: empty labeling, no iterations
        return (
            ray.data.from_arrow(
                pa.table(
                    {
                        id_col: pa.array([], pa.int64()),
                        "cluster": pa.array([], pa.int32()),
                    }
                )
            ),
            np.zeros((0, 0), dtype=np.int64),
        )
    cents = np.stack(head["q"].to_numpy()).astype(np.int64)
    d = cents.shape[1]

    for _ in range(iters):
        c_now = cents  # bind per iteration for the task closure

        def partials(t: pa.Table, _c=c_now) -> pa.Table:
            if t.num_rows == 0:  # np.stack rejects an empty block
                return pa.table(
                    {
                        "cl": pa.array([], pa.int32()),
                        "dim": pa.array([], pa.int32()),
                        "s": pa.array([], pa.int64()),
                    }
                )
            xq = np.stack(t.column("q").to_numpy(zero_copy_only=False)).astype(
                np.int64
            )
            a = _assign(xq, _c)
            cl_out, dim_out, s_out = [], [], []
            for c in range(_c.shape[0]):
                mask = a == c
                cnt = int(mask.sum())
                if cnt == 0:
                    continue
                sums = xq[mask].sum(axis=0)
                cl_out.extend([c] * (d + 1))
                dim_out.extend(list(range(d)) + [-1])  # dim -1 row = count
                s_out.extend([int(v) for v in sums] + [cnt])
            return pa.table(
                {
                    "cl": pa.array(cl_out, pa.int32()),
                    "dim": pa.array(dim_out, pa.int32()),
                    "s": pa.array(s_out, pa.int64()),
                }
            )

        agg = (
            qds.map_batches(partials, batch_format="pyarrow")
            .groupby(["cl", "dim"])
            .aggregate(Sum("s", alias_name="s"))
            .to_pandas()  # k×(d+1) rows
        )
        new_cents = cents.copy()  # empty clusters keep their centroid
        for c in range(k):
            rows = agg[agg["cl"] == c]
            if rows.empty:
                continue
            cnt = int(rows[rows["dim"] == -1]["s"].iloc[0])
            sums = (
                rows[rows["dim"] >= 0]
                .sort_values("dim")["s"]
                .to_numpy()
                .astype(np.float64)
            )
            new_cents[c] = round_half_away(sums / cnt).astype(np.int64)
        cents = new_cents

    c_final = cents

    def label(t: pa.Table, _c=c_final) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    id_col: t.column(id_col),
                    "cluster": pa.array([], pa.int32()),
                }
            )
        xq = np.stack(t.column("q").to_numpy(zero_copy_only=False)).astype(np.int64)
        return pa.table(
            {
                id_col: t.column(id_col),
                "cluster": pa.array(_assign(xq, _c), pa.int32()),
            }
        )

    return qds.map_batches(label, batch_format="pyarrow"), c_final


def label_centroid_sums(
    ds: "ray.data.Dataset",
    label_col: str = "label",
    emb_col: str = "embedding",
) -> "ray.data.Dataset":
    """Grouped VECTOR aggregate: exact per-(label, dim) quantized sums
    and counts — the centroid's exact integer numerator/denominator
    (mean = sum_q / n / QUANT, derivable without any float exchanged).

    Shape: per-batch sort-by-label + ``np.add.reduceat`` turns each
    block into <= |labels| x d long-format partial rows; ONE
    (label, dim) groupby finishes — the exchange and the result are
    |labels| x d sized, never corpus-sized."""

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    label_col: pa.array([], pa.int64()),
                    "dim": pa.array([], pa.int64()),
                    "sum_q": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        xq = _quant_matrix(t.column(emb_col))
        labels = (
            t.column(label_col).to_numpy(zero_copy_only=False).astype(np.int64)
        )
        order = np.argsort(labels, kind="stable")
        labels_s, xq_s = labels[order], xq[order]
        starts = np.flatnonzero(np.r_[True, labels_s[1:] != labels_s[:-1]])
        sums = np.add.reduceat(xq_s, starts, axis=0)  # (n_labels, d)
        cnts = np.diff(np.r_[starts, labels_s.size])
        n_labels, d = sums.shape
        return pa.table(
            {
                label_col: pa.array(np.repeat(labels_s[starts], d)),
                "dim": pa.array(
                    np.tile(np.arange(1, d + 1, dtype=np.int64), n_labels)
                ),
                "sum_q": pa.array(sums.reshape(-1)),
                "n": pa.array(np.repeat(cnts.astype(np.int64), d)),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([label_col, "dim"])
        .aggregate(Sum("sum_q", alias_name="sum_q"), Sum("n", alias_name="n"))
    )
