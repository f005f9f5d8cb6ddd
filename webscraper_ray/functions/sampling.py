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

    Scale shape — no corpus-proportional reduce anywhere:

    1. ONE streaming pass builds a per-source histogram of the hash's
       TOP 16 BITS (driver gather bounded by |targets| x 65536 rows, a
       CONSTANT independent of corpus size). The histogram also yields
       the per-source counts, so no separate count pass.
    2. The driver finds each source's exact threshold bucket B_s (the
       65536-ile containing the kept_s-th smallest hash) and the
       residual quota rem_s inside it.
    3. ONE more streaming pass keeps rows with bucket < B_s outright (a
       pure map filter — these are exactly the quota minus the boundary
       bucket) and routes ONLY boundary-bucket rows (expected
       count_s/65536; md5 uniformity) through a small source-keyed
       exchange for the exact bottom-rem_s by (hash, id).
    """
    import numpy as np

    targets = {k: float(v) for k, v in weights.items() if v > 0}
    if not targets:
        raise ValueError("domain_mix: weights must name at least one source")

    src_arr = np.array(sorted(targets))

    def _hashes(t: pa.Table):
        strata = t.column(stratum_col).to_numpy(zero_copy_only=False)
        sel = np.isin(strata, src_arr)
        if not sel.any():
            return None
        t = t.filter(pa.array(sel))
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(ids, return_inverse=True)
        uh = np.fromiter(
            (md5_u64(str(v)) for v in uniq), dtype=np.uint64, count=len(uniq)
        )
        h = uh[inv]
        code = np.searchsorted(src_arr, strata[sel])
        return t, h, code

    # ---- pass 1: per-(source, top-16-bit bucket) histogram partials
    def hist_partial(t: pa.Table) -> pa.Table:
        got = _hashes(t)
        if got is None:
            return pa.table(
                {"key": pa.array([], pa.int64()), "cnt": pa.array([], pa.int64())}
            )
        _t, h, code = got
        key = code.astype(np.int64) * 65536 + (h >> np.uint64(48)).astype(np.int64)
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {"key": pa.array(uk), "cnt": pa.array(cnt.astype(np.int64))}
        )

    from ray.data.aggregate import Sum

    hist_rows = (
        ds.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("key")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .take_all()
    )  # bounded: <= |targets| * 65536 rows, constant in corpus size
    hist = np.zeros((len(src_arr), 65536), dtype=np.int64)
    for r in hist_rows:
        hist[r["key"] // 65536, r["key"] % 65536] = r["cnt"]
    counts = hist.sum(axis=1)
    scale = min(
        counts[i] / targets[s] for i, s in enumerate(src_arr.tolist())
    )
    kept_arr = np.floor(
        scale * np.array([targets[s] for s in src_arr.tolist()])
    ).astype(np.int64)

    # per-source threshold bucket and residual quota inside it
    cum = np.cumsum(hist, axis=1)
    b_arr = np.full(len(src_arr), -1, dtype=np.int64)
    rem_arr = np.zeros(len(src_arr), dtype=np.int64)
    for i, k in enumerate(kept_arr):
        if k <= 0:
            continue
        b = int(np.searchsorted(cum[i], k))  # first bucket with cum >= k
        below = int(cum[i][b - 1]) if b > 0 else 0
        b_arr[i], rem_arr[i] = b, int(k) - below

    # ---- pass 2: keep below-threshold outright; tag boundary rows
    def select(t: pa.Table) -> pa.Table:
        got = _hashes(t)
        if got is None:
            empty = t.slice(0, 0)
            return empty.append_column("_bnd", pa.array([], pa.int8()))
        t, h, code = got
        hi = (h >> np.uint64(48)).astype(np.int64)
        below = hi < b_arr[code]
        bnd = hi == b_arr[code]
        keep = below | bnd
        out = t.filter(pa.array(keep))
        return out.append_column(
            "_bnd", pa.array(bnd[keep].astype(np.int8))
        )

    def boundary_bottom(part: pa.Table) -> pa.Table:
        got = _hashes(part)
        if got is None:
            return part.slice(0, 0)
        part, h, code = got
        ids = part.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, h, code))
        code_s = code[order]
        starts = np.flatnonzero(np.r_[True, code_s[1:] != code_s[:-1]])
        sizes = np.diff(np.r_[starts, code_s.size])
        rank = np.arange(code_s.size) - np.repeat(starts, sizes)
        keep_idx = order[rank < rem_arr[code_s]]
        return part.take(pa.array(np.sort(keep_idx)))

    mat = ds.map_batches(select, batch_format="pyarrow").materialize()

    def only(flag: int):
        def fn(t: pa.Table) -> pa.Table:
            mask = pc.equal(t.column("_bnd"), flag)
            return t.filter(mask).drop_columns(["_bnd"])

        return fn

    selected = mat.map_batches(only(0), batch_format="pyarrow")
    boundary = (
        mat.map_batches(only(1), batch_format="pyarrow")
        .groupby(stratum_col)
        .map_groups(boundary_bottom, batch_format="pyarrow")
    )
    return selected.union(boundary)
