"""Deterministic stratified sampling for training-data curation.

Downsampling a dominant stratum (language, source, domain) is the first
step of most corpus-mixing recipes. The sampler is HASH-deterministic,
never RNG: a row survives iff ``md5_u64(str(id)) % 100 < rate(stratum)``
— the same md5 family every sketch in this repo uses
(``functions/dedup.py:79``), so the decision is reproducible at any
parallelism, stable across reruns (resumable output), and exactly
reproducible in the SQL oracle via
``('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 16))::UBIGINT % 100``.

Shape: pure ``map_batches`` filter — no shuffle, no state, no driver
participation; rates ride in the closure (broadcast once per task, a
few bytes).
"""

from __future__ import annotations

from typing import Mapping

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .dedup import md5_u64

__all__ = ["stratified_sample"]


def stratified_sample(
    ds: "ray.data.Dataset",
    *,
    id_col: str,
    stratum_col: str,
    rates_pct: Mapping[str, int],
    default_pct: int,
) -> "ray.data.Dataset":
    """Keep ``rate(stratum)`` percent of each stratum, deterministically.

    ``rates_pct`` maps stratum value -> integer percent [0, 100];
    unlisted strata use ``default_pct``.
    """
    rates = dict(rates_pct)

    def keep(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_pylist()
        # one md5 pass over the batch's ids (hashing is per-value by
        # nature; everything around it stays columnar)
        buckets = pa.array([md5_u64(str(i)) % 100 for i in ids], pa.int64())
        # thresholds: map the handful of DISTINCT strata once, then
        # index_in/take back — never a per-row dict.get
        strata = t.column(stratum_col).combine_chunks()
        uniq = pc.unique(strata)
        per_uniq = pa.array(
            [rates.get(u.as_py(), default_pct) for u in uniq], pa.int64()
        )
        thresholds = pc.take(per_uniq, pc.index_in(strata, value_set=uniq))
        return t.filter(pc.less(buckets, thresholds))

    return ds.map_batches(keep, batch_format="pyarrow")
