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

__all__ = ["stratified_sample", "domain_mix"]


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


def domain_mix(
    ds: "ray.data.Dataset",
    *,
    id_col: str,
    stratum_col: str,
    weights: Mapping[str, float],
) -> "ray.data.Dataset":
    """Resample the corpus to a TARGET source mix, deterministically.

    The data-mixing step of a training recipe: given target proportions
    over a chosen set of sources (unlisted sources are dropped), keep
    the LARGEST corpus whose per-source counts match the target exactly
    — ``scale = min_s(count_s / w_s)``, ``kept_s = floor(scale * w_s)``
    — selecting each source's ``kept_s`` docs with the SMALLEST
    ``md5_u64(str(id))`` (ties: id ascending). Hash-order selection
    makes the sample reproducible at any parallelism and expressible in
    the oracle as a ``row_number() OVER (PARTITION BY source ORDER BY
    md5-prefix-int, id)`` filter.

    Scale shape: per-source counts reduce to a driver table bounded by
    the SOURCE CARDINALITY (documented contract — sources are a mixing
    recipe's handful, never corpus-proportional); selection is a
    per-batch partial bottom-``kept_s`` per source, then ONE
    source-keyed exchange carrying <= kept_s rows per source per block.
    """
    import numpy as np

    from ray.data.aggregate import Count

    targets = {k: float(v) for k, v in weights.items() if v > 0}
    if not targets:
        raise ValueError("domain_mix: weights must name at least one source")

    counts_rows = (
        ds.groupby(stratum_col).aggregate(Count(alias_name="c")).take_all()
    )  # bounded: one row per distinct source
    counts = {r[stratum_col]: r["c"] for r in counts_rows}
    scale = min(counts.get(s, 0) / w for s, w in targets.items())
    kept = {s: int(np.floor(scale * w)) for s, w in targets.items()}

    src_arr = np.array(sorted(targets))
    kept_arr = np.array([kept[s] for s in sorted(targets)], dtype=np.int64)

    def bottom_k(t: pa.Table) -> pa.Table:
        strata = t.column(stratum_col).to_numpy(zero_copy_only=False)
        sel = np.isin(strata, src_arr)
        if not sel.any():
            return t.slice(0, 0)
        t = t.filter(pa.array(sel))
        strata = strata[sel]
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(ids, return_inverse=True)
        uh = np.fromiter(
            (md5_u64(str(v)) for v in uniq), dtype=np.uint64, count=len(uniq)
        )
        h = uh[inv]
        code = np.searchsorted(src_arr, strata)
        order = np.lexsort((ids, h, code))
        code_s = code[order]
        starts = np.flatnonzero(np.r_[True, code_s[1:] != code_s[:-1]])
        sizes = np.diff(np.r_[starts, code_s.size])
        rank = np.arange(code_s.size) - np.repeat(starts, sizes)
        keep_idx = order[rank < kept_arr[code_s]]
        return t.take(pa.array(np.sort(keep_idx)))

    partial = ds.map_batches(bottom_k, batch_format="pyarrow")
    return (
        partial.groupby(stratum_col)
        .map_groups(bottom_k, batch_format="pyarrow")
    )
