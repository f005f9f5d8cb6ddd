"""Distributed batch-perceptron training — the minimal end-to-end
"train a model on the corpus" operator (Rosenblatt'58 / Novikoff'62
convergence bound; the same data-parallel gradient shape as minibatch
SGD at cluster scale: Dean et al., NeurIPS'12).

Determinism / oracle-gating discipline (the k-means pattern,
``clustering.py``): features are QUANTIZED int64 (``round(x * 1000)``
— coarser than k-means' 1e6 to leave dot-product headroom), the batch
update is the exact integer sum

    w[j] += sum_i  y_i * q_ij  over points with  y_i * (w . q_i) <= 0

applied once per full pass (lr = 1), so addition order cannot perturb
a bit and DuckDB replays the identical registers via chained CTEs.

Scale shape, per iteration: ONE streaming corpus pass — each batch
computes its misclassified-set partial gradient as a (d,)-int64 vector
(pure matmul), partials tree-reduce through a d-row groupby, and the
driver holds only the d-int model (the canonical data-parallel GD
split: model broadcast via closure, gradient reduced). NO all-to-all
of corpus rows, ever. int64 headroom is guarded loudly per iteration:
``d * max|w| * max|q|`` must stay inside 2^62.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data
from ray.data.aggregate import Sum

__all__ = ["SCALE", "perceptron_train"]

SCALE = 1000  # feature quantization: q = round(x * SCALE), int64

_GUARD = 1 << 62


def _quant(col: pa.ChunkedArray) -> np.ndarray:
    from .clustering import _quant_matrix

    return _quant_matrix(col, quant=SCALE)


def perceptron_train(
    ds: "ray.data.Dataset",
    d: int,
    iters: int = 3,
    label_dims: int = 8,
    emb_col: str = "embedding",
) -> pa.Table:
    """Train ``iters`` exact-integer batch-perceptron passes; labels are
    the derived realizable target ``y = +1 if sum(q[:label_dims]) > 0
    else -1`` (a sparse true separator, so the perceptron's mistake
    bound applies). Returns the final ``(dim, weight)`` model table —
    d rows, driver-sized by construction."""
    w = np.zeros(d, dtype=np.int64)

    def make_partial(w_now: np.ndarray):
        def partial(t: pa.Table) -> pa.Table:
            q = _quant(t.column(emb_col))
            if q.size == 0:
                return pa.table(
                    {
                        "dim": pa.array([], pa.int64()),
                        "g": pa.array([], pa.int64()),
                    }
                )
            y = np.where(q[:, :label_dims].sum(axis=1) > 0, 1, -1).astype(
                np.int64
            )
            margin = y * (q @ w_now)
            mis = margin <= 0
            g = (q[mis] * y[mis, None]).sum(axis=0, dtype=np.int64)
            return pa.table(
                {
                    "dim": pa.array(np.arange(1, d + 1, dtype=np.int64)),
                    "g": pa.array(g),
                }
            )

        return partial

    for _ in range(iters):
        rows = (
            ds.map_batches(make_partial(w.copy()), batch_format="pyarrow")
            .groupby("dim")
            .aggregate(Sum("g", alias_name="g"))
            .take_all()  # d rows — the model, control-sized by design
        )
        g = np.zeros(d, dtype=np.int64)
        for r in rows:
            g[r["dim"] - 1] = r["g"]
        w = w + g
        maxw = int(np.abs(w).max()) if d else 0
        if d * maxw * (4 * SCALE) >= _GUARD:
            raise ValueError(
                "perceptron int64 dot-product headroom exceeded "
                f"(max|w| = {maxw}); lower SCALE or normalize features"
            )

    return pa.table(
        {
            "dim": pa.array(np.arange(1, d + 1, dtype=np.int64)),
            "weight": pa.array(w),
        }
    )
