"""Exact distributed quantiles over a bounded-cardinality column.

Length/score distributions (p50/p90/p99 of document length, token
count, quality score) steer every corpus-curation cut. For integer-ish
columns the exact answer needs no sketch: aggregate VALUE COUNTS — the
shuffle and the driver gather are sized by the column's distinct-value
cardinality (document lengths: ~10^5 values), never by row count.

Shape: per-batch ``group_by(col).count`` partial (one row per distinct
value per block) -> one small ``groupby(col).sum`` all-to-all -> the
distinct-value histogram sorts driver-side (output-sized, like the
dedup candidate sets) and quantiles read off the cumulative counts.

Quantile convention: the element at 1-indexed rank ``ceil(q * n)`` —
DuckDB's ``quantile_disc``, verified against it for several n.

The bounded-cardinality contract is ENFORCED: the histogram's distinct
count is checked (by block metadata, no extra pass) against
``max_distinct`` before anything gathers — a high-cardinality float
column raises instead of OOMing the driver.
"""

from __future__ import annotations

import math
from typing import Sequence

import numpy as np
import pyarrow as pa

import ray.data
from ray.data.aggregate import Sum

__all__ = [
    "exact_quantiles",
    "exact_quantiles_by_group",
    "exact_quantile_disc_unbounded",
    "grouped_quantile_disc_unbounded",
    "rank_weighted_sum_cents",
    "grouped_rank_weighted_sum_cents",
    "MAX_DISTINCT_GATHER",
]

# The driver gather is sized by the column's distinct-value count. The
# algorithm's contract is integer-ish/bounded-cardinality columns; a
# high-cardinality float column (cardinality ~ row count) would silently
# turn the gather corpus-sized. Above this bound (~tens of MB of
# histogram rows) the call FAILS LOUDLY instead of OOMing the driver —
# callers with such columns should bucket/round the column first.
MAX_DISTINCT_GATHER = 4_000_000


def _gather_histogram(agg: "ray.data.Dataset", what: str, max_distinct: int):
    """Materialize the value-count histogram, guard its cardinality by
    METADATA count (no extra pass over the data), then gather."""
    import ray as _ray

    agg = agg.materialize()
    n_distinct = agg.count()
    if n_distinct > max_distinct:
        raise ValueError(
            f"exact_quantiles: {what} has {n_distinct} distinct values "
            f"(> {max_distinct}); the exact histogram gather would be "
            "driver-unbounded. Round/bucket the column first, raise "
            "max_distinct explicitly, or use "
            "exact_quantile_disc_unbounded (iterative bucket "
            "refinement, cap-bounded gather at any cardinality)."
        )
    # Ray's sort emits zero-SCHEMA blocks for empty range partitions —
    # drop them before concat
    return [p for p in _ray.get(agg.to_arrow_refs()) if p.num_rows > 0]


def exact_quantiles(
    ds: "ray.data.Dataset",
    col: str,
    qs: Sequence[float],
    max_distinct: int = MAX_DISTINCT_GATHER,
) -> pa.Table:
    """Exact discrete quantiles of ``col``; returns (q, value) rows."""

    def partial(t: pa.Table) -> pa.Table:
        g = t.select([col]).group_by(col).aggregate([(col, "count")])
        return g.rename_columns([col, "cnt"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(col)
        .aggregate(Sum("cnt", alias_name="cnt"))
    )
    parts = _gather_histogram(agg, f"column {col!r}", max_distinct)
    if not parts:
        return pa.table(
            {"q": pa.array(list(qs), pa.float64()), col: pa.nulls(len(qs))}
        )
    t = pa.concat_tables(parts)
    values = t.column(col).to_numpy(zero_copy_only=False)
    counts = t.column("cnt").to_numpy(zero_copy_only=False)
    order = np.argsort(values, kind="stable")
    values, counts = values[order], counts[order]
    cum = np.cumsum(counts)
    n = int(cum[-1]) if cum.size else 0
    picks = []
    for q in qs:
        rank = max(1, math.ceil(q * n))  # quantile_disc: 1-indexed ceil(q*n)
        picks.append(values[np.searchsorted(cum, rank, side="left")])
    return pa.table(
        {"q": pa.array(list(qs), pa.float64()), col: pa.array(picks)}
    )


def exact_quantiles_by_group(
    ds: "ray.data.Dataset",
    group_col: str,
    col: str,
    qs: Sequence[float],
    max_distinct: int = MAX_DISTINCT_GATHER,
) -> pa.Table:
    """Exact discrete quantiles of ``col`` per ``group_col`` value;
    returns (group, q, value) rows. Same shape as
    :func:`exact_quantiles`: the shuffle and the gather carry one row
    per (group, distinct value) — the histogram, never the rows."""

    def partial(t: pa.Table) -> pa.Table:
        g = (
            t.select([group_col, col])
            .group_by([group_col, col])
            .aggregate([(col, "count")])
        )
        return g.rename_columns([group_col, col, "cnt"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([group_col, col])
        .aggregate(Sum("cnt", alias_name="cnt"))
    )
    parts = _gather_histogram(
        agg, f"({group_col!r}, {col!r}) pairs", max_distinct
    )
    if not parts:
        return pa.table(
            {
                group_col: pa.array([], pa.string()),
                "q": pa.array([], pa.float64()),
                col: pa.array([], pa.int64()),
            }
        )
    t = pa.concat_tables(parts)
    groups = t.column(group_col).to_numpy(zero_copy_only=False)
    values = t.column(col).to_numpy(zero_copy_only=False)
    counts = t.column("cnt").to_numpy(zero_copy_only=False)
    order = np.lexsort((values, groups))
    groups, values, counts = groups[order], values[order], counts[order]
    out_g, out_q, out_v = [], [], []
    start = 0
    for end in list(np.flatnonzero(groups[1:] != groups[:-1]) + 1) + [len(groups)]:
        cum = np.cumsum(counts[start:end])
        n = int(cum[-1])
        for q in qs:
            rank = max(1, math.ceil(q * n))
            out_g.append(groups[start])
            out_q.append(q)
            out_v.append(values[start + np.searchsorted(cum, rank, side="left")])
        start = end
    return pa.table(
        {
            group_col: pa.array(out_g),
            "q": pa.array(out_q, pa.float64()),
            col: pa.array(out_v),
        }
    )


def percentile_rank(
    ds: "ray.data.Dataset",
    id_col: str,
    col: str,
    max_distinct: int = MAX_DISTINCT_GATHER,
) -> "ray.data.Dataset":
    """Distributed ``percent_rank() OVER (ORDER BY col)`` for every row
    without a global sort: (rank-1)/(N-1) with min-rank tie semantics.

    A naive window function is a full-corpus sort; the exact answer only
    needs the VALUE-COUNT HISTOGRAM (same bounded-cardinality contract
    and loud guard as :func:`exact_quantiles`). One histogram exchange,
    the (value -> strictly-below count) table broadcasts once, and a
    second streaming pass attaches ranks by searchsorted — no row-level
    shuffle at all. Ranks are rounded half-away to 6 decimals to match
    the SQL oracle's rounding."""
    import ray as _ray

    from .clustering import round_half_away

    def partial(t: pa.Table) -> pa.Table:
        g = t.select([col]).group_by(col).aggregate([(col, "count")])
        return g.rename_columns([col, "cnt"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(col)
        .aggregate(Sum("cnt", alias_name="cnt"))
    )
    parts = _gather_histogram(agg, f"column {col!r}", max_distinct)
    t = pa.concat_tables(parts)
    values = t.column(col).to_numpy(zero_copy_only=False)
    counts = t.column("cnt").to_numpy(zero_copy_only=False)
    order = np.argsort(values, kind="stable")
    values, counts = values[order], counts[order]
    below = np.cumsum(counts) - counts  # rows strictly less than value
    n = int(counts.sum())
    pct = (
        round_half_away(below.astype(np.float64) / (n - 1) * 1e6) / 1e6
        if n > 1
        else np.zeros_like(below, dtype=np.float64)
    )
    lut_ref = _ray.put((values, pct))

    def attach(batch: pa.Table) -> pa.Table:
        vals_s, pct_s = _ray.get(lut_ref)
        v = batch.column(col).to_numpy(zero_copy_only=False)
        pos = np.searchsorted(vals_s, v)
        return pa.table(
            {
                id_col: batch.column(id_col),
                col: batch.column(col),
                "pct_rank": pa.array(pct_s[pos], pa.float64()),
            }
        )

    return ds.map_batches(attach, batch_format="pyarrow")

def exact_quantiles_cont(
    ds: "ray.data.Dataset",
    col: str,
    qs: Sequence[float],
    max_distinct: int = MAX_DISTINCT_GATHER,
) -> pa.Table:
    """Exact INTERPOLATED quantiles (``quantile_cont``): same
    distinct-value-histogram distribution as :func:`exact_quantiles`,
    but the readoff linearly interpolates between the two straddling
    ranks with DuckDB's own formula — ``RN = q*(n-1)`` (0-indexed),
    ``(CRN-RN)*v[FRN] + (RN-FRN)*v[CRN]`` — op-for-op, so the float
    output is bit-reproducible against the SQL oracle."""

    def partial(t: pa.Table) -> pa.Table:
        g = t.select([col]).group_by(col).aggregate([(col, "count")])
        return g.rename_columns([col, "cnt"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(col)
        .aggregate(Sum("cnt", alias_name="cnt"))
    )
    parts = _gather_histogram(agg, f"column {col!r}", max_distinct)
    if not parts:
        return pa.table(
            {"q": pa.array(list(qs), pa.float64()), col: pa.nulls(len(qs))}
        )
    t = pa.concat_tables(parts)
    values = t.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
    counts = t.column("cnt").to_numpy(zero_copy_only=False)
    order = np.argsort(values, kind="stable")
    values, counts = values[order], counts[order]
    cum = np.cumsum(counts)
    n = int(cum[-1]) if cum.size else 0

    def value_at(idx0: int) -> float:
        # value at 0-indexed overall rank idx0 via the cumulative counts
        return float(values[np.searchsorted(cum, idx0 + 1, side="left")])

    picks = []
    for q in qs:
        rn = q * (n - 1)
        frn, crn = math.floor(rn), math.ceil(rn)
        if frn == crn:
            picks.append(value_at(frn))
        else:
            picks.append(
                (crn - rn) * value_at(frn) + (rn - frn) * value_at(crn)
            )
    return pa.table(
        {
            "q": pa.array(list(qs), pa.float64()),
            col: pa.array(picks, pa.float64()),
        }
    )


def exact_quantile_disc_unbounded(
    ds: "ray.data.Dataset",
    value_col: str,
    fractions: Sequence[float],
    *,
    w0: int = 10_000,
    cap: int = 100_000,
    shrink: int = 100,
    weight_col: str | None = None,
) -> list[tuple[float, float]]:
    """Exact ``quantile_disc`` (value at 1-based rank ``ceil(q*n)``)
    over an UNBOUNDED-cardinality money column — the scalable
    complement to :func:`exact_quantiles`' guarded distinct-value
    histogram.

    With ``weight_col`` (positive INTEGER weights, guarded), quantiles
    are over the multiset where each row repeats ``weight`` times —
    i.e. the value at weighted rank ``ceil(q * W)``, ``W`` the total
    weight: the smallest value whose value-ordered cumulative weight
    reaches the rank. Every refinement histogram sums weights instead
    of row counts; because weights are >= 1, a bucket's weighted count
    bounds its ROW count, so the ``cap``-bounded final gather still
    holds row-for-row.

    Iterative bucket refinement: each level streams ONE histogram pass
    counting rows per ``cents // W`` bucket, restricted to the still-
    unresolved target intervals (broadcast bounds, vectorized interval
    test); the driver narrows every target rank to a child interval and
    shrinks ``W`` by ``shrink`` until each target interval holds at
    most ``cap`` rows (or W == 1, where a residual interval is a
    single cent value — its row count is the value's multiplicity,
    gathered regardless and documented as the one data-dependent
    bound). The final pass gathers ONLY resolved-interval rows and
    selects each boundary by local sort of the ORIGINAL doubles (cents
    order is a monotone coarsening of double order, so within-interval
    double sort is globally correct and float identity with a SQL
    oracle is exact).

    Driver artifacts per level: <= shrink x |intervals| count rows.
    Total scans: 1 + ceil(log_shrink(w0)) histogram passes + 1 gather.
    """
    import ray as _ray

    def cents_of(t: pa.Table) -> np.ndarray:
        v = t.column(value_col).to_numpy(zero_copy_only=False)
        return np.where(
            v >= 0, np.floor(v * 100.0 + 0.5), np.ceil(v * 100.0 - 0.5)
        ).astype(np.int64)

    def weights_of(t: pa.Table) -> np.ndarray | None:
        if weight_col is None:
            return None
        wv = t.column(weight_col).to_numpy(zero_copy_only=False)
        w = wv.astype(np.int64)
        if w.size and (w.min() < 1 or np.any(w != wv)):
            raise ValueError(
                "exact_quantile_disc_unbounded: weights must be positive "
                "integers (each row repeats weight times)"
            )
        return w

    LO, HI = np.int64(-(1 << 62)), np.int64(1 << 62)

    # ---- level passes -------------------------------------------------
    # intervals: sorted disjoint [lo, hi) cent ranges still unresolved;
    # alongside each, the (fraction_index, local_rank) targets inside it
    w = int(w0)
    n_total: int | None = None
    pending: list[tuple[int, int, list[tuple[int, int]]]] | None = None
    resolved: list[tuple[int, int, list[tuple[int, int]]]] = []
    while True:
        if pending is None:
            bounds = None  # first pass: whole domain
        else:
            bounds = (
                np.asarray([p[0] for p in pending], dtype=np.int64),
                np.asarray([p[1] for p in pending], dtype=np.int64),
            )
        bounds_ref = _ray.put(bounds)
        w_scal = np.int64(w)

        def hist_partial(t: pa.Table, _ref=bounds_ref, _w=w_scal) -> pa.Table:
            c = cents_of(t)
            wts = weights_of(t)
            b = _ray.get(_ref)
            if b is not None:
                los, his = b
                idx = np.searchsorted(los, c, side="right") - 1
                idx = np.maximum(idx, 0)
                keep = (c >= los[idx]) & (c < his[idx])
                c = c[keep]
                if wts is not None:
                    wts = wts[keep]
            bk = c // _w
            if bk.size == 0:
                return pa.table(
                    {"bucket": pa.array([], pa.int64()),
                     "n": pa.array([], pa.int64())}
                )
            if wts is None:
                u, cnt = np.unique(bk, return_counts=True)
                cnt = cnt.astype(np.int64)
            else:
                # bincount's float64 accumulation is exact below 2^53 —
                # far above any per-batch weight sum (and 10-50x faster
                # than the np.add.at scatter)
                u, inv = np.unique(bk, return_inverse=True)
                cnt = np.bincount(inv, weights=wts).astype(np.int64)
            return pa.table({"bucket": pa.array(u), "n": pa.array(cnt)})

        hist_rows = _hash_sum_rows(
            ds.map_batches(hist_partial, batch_format="pyarrow"), "bucket", "n"
        )
        hist_rows.sort(key=lambda r: r["bucket"])
        hbuckets = np.asarray([int(r["bucket"]) for r in hist_rows], dtype=np.int64)
        hcounts = np.asarray([int(r["n"]) for r in hist_rows], dtype=np.int64)

        if pending is None:
            n_total = int(hcounts.sum())
            if n_total == 0:
                return [(float(f), float("nan")) for f in fractions]
            from fractions import Fraction

            def _rank(f) -> int:  # exact ceil(f*n), immune to float error
                fr = Fraction(str(f))
                return max(1, -((-fr.numerator * n_total) // fr.denominator))

            pending = [
                (
                    int(LO),
                    int(HI),
                    [(fi, _rank(f)) for fi, f in enumerate(fractions)],
                )
            ]

        nxt: list[tuple[int, int, list[tuple[int, int]]]] = []
        for lo, hi, targs in pending:
            sel = (hbuckets * w >= lo) & (hbuckets * w < hi)
            bks, cnts = hbuckets[sel], hcounts[sel]
            cum = np.concatenate([[0], np.cumsum(cnts)])
            children: dict[int, list[tuple[int, int]]] = {}
            for fi, r in targs:
                i = int(np.searchsorted(cum[1:], r))
                children.setdefault(i, []).append((fi, r - int(cum[i])))
            for i, sub in children.items():
                c_lo = max(lo, int(bks[i]) * w)
                c_hi = min(hi, (int(bks[i]) + 1) * w)
                item = (c_lo, c_hi, sub)
                if int(cnts[i]) <= cap or w == 1:
                    resolved.append(item)
                else:
                    nxt.append(item)
        if not nxt:
            break
        pending = sorted(nxt)
        w = max(1, w // shrink)

    # ---- final gather -------------------------------------------------
    resolved.sort()
    los = np.asarray([r[0] for r in resolved], dtype=np.int64)
    his = np.asarray([r[1] for r in resolved], dtype=np.int64)
    fin_ref = _ray.put((los, his))

    def in_final(t: pa.Table, _ref=fin_ref) -> pa.Table:
        c = cents_of(t)
        wts = weights_of(t)
        flos, fhis = _ray.get(_ref)
        idx = np.searchsorted(flos, c, side="right") - 1
        idx = np.maximum(idx, 0)
        keep = (c >= flos[idx]) & (c < fhis[idx])
        return pa.table(
            {
                "iv": pa.array(idx[keep].astype(np.int64)),
                "v": pa.array(
                    t.column(value_col).to_numpy(zero_copy_only=False)[keep]
                ),
                "w": pa.array(
                    (np.ones(int(keep.sum()), np.int64) if wts is None
                     else wts[keep])
                ),
            }
        )

    rows = ds.map_batches(in_final, batch_format="pyarrow").take_all()
    by_iv: dict[int, list[tuple[float, int]]] = {}
    for r in rows:
        by_iv.setdefault(int(r["iv"]), []).append((float(r["v"]), int(r["w"])))
    out: list[tuple[float, float]] = []
    for i, (_lo, _hi, targs) in enumerate(resolved):
        pairs = sorted(by_iv[i])
        cum = np.cumsum([w for _, w in pairs])
        for fi, local_rank in targs:
            out.append(
                (
                    float(fractions[fi]),
                    pairs[int(np.searchsorted(cum, local_rank, side="left"))][0],
                )
            )
    out.sort()
    return out

def _hash_sum_rows(
    partials: "ray.data.Dataset", key: str, val: str, num_partitions: int = 16
) -> list[dict]:
    """Sum ``val`` per ``key`` over already-pre-reduced partial tables
    via the repo's hash-partition discipline: Ray's sort-based groupby
    pays seconds on 10^4+ distinct keys (BASELINE-measured 6-40x),
    while a ``num_partitions``-key groupby + one arrow group_by per
    partition costs O(distinct). Keys are int64 (negatives hash through
    the same deterministic uint64 wraparound as :func:`_bucket_part`).
    Returns the combined rows (distinct-key-sized driver gather — the
    callers' bucket domains are bounded by construction)."""

    def add_p(t: pa.Table) -> pa.Table:
        k = t.column(key).to_numpy(zero_copy_only=False)
        return t.append_column("_p", pa.array(_bucket_part(k, num_partitions)))

    def comb(t: pa.Table) -> pa.Table:
        g = t.drop_columns(["_p"]).group_by(key).aggregate([(val, "sum")])
        return g.rename_columns([key, val])

    return (
        partials.map_batches(add_p, batch_format="pyarrow")
        .groupby("_p")
        .map_groups(comb, batch_format="pyarrow")
        .take_all()
    )


def _bucket_part(keys: np.ndarray, num_partitions: int) -> np.ndarray:
    """Knuth multiplicative partition hash over int keys — the ONE
    implementation shared by the rank/refinement kernels' pass-1
    histogram combine AND pass-2 bucket shuffle (both must key on the
    same bucket → partition map). Negative int64 keys go through
    deterministic uint64 wraparound."""
    k = keys.astype(np.uint64)
    return (
        (k * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(num_partitions)
    ).astype(np.int32)


# Per-group cent domain for grouped unbounded refinement: a multiple of
# every bucket width in the w0 -> w0/shrink -> ... -> 1 chain (powers of
# 10), so no bucket ever straddles a group boundary. 10^12 cents =
# $10 billion per value; ~9.2e6 groups fit below int64.
_GROUP_DOMAIN = 10**12


def grouped_quantile_disc_unbounded(
    ds: "ray.data.Dataset",
    group_col: str,
    value_col: str,
    fractions: Sequence[float],
    *,
    w0: int = 10_000,
    cap: int = 100_000,
    shrink: int = 100,
    max_groups: int = 10_000,
    weight_col: str | None = None,
) -> list[tuple[object, float, float]]:
    """Exact per-GROUP ``quantile_disc`` over an unbounded-cardinality
    money column — :func:`exact_quantile_disc_unbounded` generalized to
    a bounded group domain (the per-group twin of the global iterative
    bucket refinement).

    One distinct-(group)->count pass sizes every group's rank targets
    (group-cardinality-bounded gather, guarded by ``max_groups``); each
    group then refines inside its own disjoint composite cent domain
    ``gidx * 10^12 + cents``, so ALL groups share every histogram pass —
    the level passes stream the corpus once each regardless of group
    count, and the driver artifact per level stays
    <= shrink x |unresolved intervals| rows. The final gather is
    cap-bounded per target exactly like the global variant, and within
    a group cents order is a monotone coarsening of double order, so
    the returned doubles are float-identical to a SQL
    ``quantile_disc(...) GROUP BY`` oracle.

    Returns ``(group, fraction, value)`` sorted, one row per non-empty
    group per fraction.

    ``weight_col`` (positive integer weights, guarded) mirrors the
    global kernel's weighted mode: per-group rank targets come from the
    group's TOTAL WEIGHT, every histogram pass sums weights, and since
    weights >= 1 the cap-bounded gather still bounds rows.
    """
    import pyarrow.compute as pc

    import ray as _ray
    from fractions import Fraction

    def wts_of(t: pa.Table) -> np.ndarray | None:
        if weight_col is None:
            return None
        wv = t.column(weight_col).to_numpy(zero_copy_only=False)
        w = wv.astype(np.int64)
        if w.size and (w.min() < 1 or np.any(w != wv)):
            raise ValueError(
                "grouped_quantile_disc_unbounded: weights must be "
                "positive integers"
            )
        return w

    # ---- group universe + per-group counts (bounded gather) ----------
    def gcounts(t: pa.Table) -> pa.Table:
        if weight_col is None:
            g = (
                t.select([group_col])
                .group_by([group_col])
                .aggregate([([], "count_all")])
            )
        else:
            wts_of(t)  # validate weights on the counting pass too
            g = (
                t.select([group_col, weight_col])
                .group_by([group_col])
                .aggregate([(weight_col, "sum")])
            )
        return g.rename_columns([group_col, "n"])

    rows = (
        ds.map_batches(gcounts, batch_format="pyarrow")
        .groupby(group_col)
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    )
    rows = [r for r in rows if r["n"]]
    if not rows:
        return []
    if len(rows) > max_groups:
        raise ValueError(
            f"grouped_quantile_disc_unbounded: {len(rows)} groups "
            f"(> max_groups={max_groups}); the per-group interval table "
            "would be driver-unbounded. Bucket the group column first."
        )
    rows.sort(key=lambda r: r[group_col])
    groups_sorted = [r[group_col] for r in rows]
    n_by_gidx = [int(r["n"]) for r in rows]
    gset_ref = _ray.put(pa.array(groups_sorted))
    GOFF = np.int64(_GROUP_DOMAIN)

    def comp_of(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        """Composite int64 key gidx*GOFF + cents, plus original doubles."""
        v = t.column(value_col).to_numpy(zero_copy_only=False)
        c = np.where(
            v >= 0, np.floor(v * 100.0 + 0.5), np.ceil(v * 100.0 - 0.5)
        ).astype(np.int64)
        if c.size and (c.min() < 0 or c.max() >= _GROUP_DOMAIN):
            raise ValueError(
                "grouped_quantile_disc_unbounded: value outside the "
                "[0, $10^10) per-group cent domain"
            )
        gidx = pc.index_in(
            t.column(group_col), value_set=_ray.get(gset_ref)
        ).to_numpy(zero_copy_only=False)
        return gidx.astype(np.int64) * GOFF + c, v

    # ---- rank targets per group: out index = (gidx, fraction index) ---
    def _rank(f: float, n: int) -> int:  # exact ceil(f*n)
        fr = Fraction(str(f))
        return max(1, -((-fr.numerator * n) // fr.denominator))

    pending: list[tuple[int, int, list[tuple[int, int]]]] = []
    for gi, n_g in enumerate(n_by_gidx):
        targs = [
            (gi * len(fractions) + fi, _rank(f, n_g))
            for fi, f in enumerate(fractions)
        ]
        pending.append((gi * _GROUP_DOMAIN, (gi + 1) * _GROUP_DOMAIN, targs))

    # ---- level passes (the exact_quantile_disc_unbounded loop over the
    # composite domain; all groups refine in the same corpus pass) ------
    # every level's width must divide the group domain, or a bucket
    # straddles a group boundary and misattributes rows across groups
    w_chain = int(w0)
    while w_chain > 1:
        if _GROUP_DOMAIN % w_chain:
            raise ValueError(
                f"grouped_quantile_disc_unbounded: width {w_chain} in the "
                f"w0/shrink chain does not divide the group domain "
                f"{_GROUP_DOMAIN}; pick w0/shrink as powers of 10"
            )
        w_chain = max(1, w_chain // shrink)
    resolved: list[tuple[int, int, list[tuple[int, int]]]] = []
    w = int(w0)
    while True:
        bounds = (
            np.asarray([p[0] for p in pending], dtype=np.int64),
            np.asarray([p[1] for p in pending], dtype=np.int64),
        )
        bounds_ref = _ray.put(bounds)
        w_scal = np.int64(w)

        def hist_partial(t: pa.Table, _ref=bounds_ref, _w=w_scal) -> pa.Table:
            c, _ = comp_of(t)
            wts = wts_of(t)
            los, his = _ray.get(_ref)
            idx = np.searchsorted(los, c, side="right") - 1
            idx = np.maximum(idx, 0)
            keep = (c >= los[idx]) & (c < his[idx])
            bk = c[keep] // _w
            if bk.size == 0:
                return pa.table(
                    {"bucket": pa.array([], pa.int64()),
                     "n": pa.array([], pa.int64())}
                )
            if wts is None:
                u, cnt = np.unique(bk, return_counts=True)
                cnt = cnt.astype(np.int64)
            else:
                u, inv = np.unique(bk, return_inverse=True)
                cnt = np.bincount(inv, weights=wts[keep]).astype(np.int64)
            return pa.table({"bucket": pa.array(u), "n": pa.array(cnt)})

        hist_rows = _hash_sum_rows(
            ds.map_batches(hist_partial, batch_format="pyarrow"), "bucket", "n"
        )
        hist_rows.sort(key=lambda r: r["bucket"])
        hbuckets = np.asarray([int(r["bucket"]) for r in hist_rows], dtype=np.int64)
        hcounts = np.asarray([int(r["n"]) for r in hist_rows], dtype=np.int64)

        nxt: list[tuple[int, int, list[tuple[int, int]]]] = []
        for lo, hi, targs in pending:
            sel = (hbuckets * w >= lo) & (hbuckets * w < hi)
            bks, cnts = hbuckets[sel], hcounts[sel]
            cum = np.concatenate([[0], np.cumsum(cnts)])
            children: dict[int, list[tuple[int, int]]] = {}
            for oi, r in targs:
                i = int(np.searchsorted(cum[1:], r))
                children.setdefault(i, []).append((oi, r - int(cum[i])))
            for i, sub in children.items():
                c_lo = max(lo, int(bks[i]) * w)
                c_hi = min(hi, (int(bks[i]) + 1) * w)
                item = (c_lo, c_hi, sub)
                if int(cnts[i]) <= cap or w == 1:
                    resolved.append(item)
                else:
                    nxt.append(item)
        if not nxt:
            break
        pending = sorted(nxt)
        w = max(1, w // shrink)

    # ---- final gather (cap-bounded per target) ------------------------
    resolved.sort()
    los = np.asarray([r[0] for r in resolved], dtype=np.int64)
    his = np.asarray([r[1] for r in resolved], dtype=np.int64)
    fin_ref = _ray.put((los, his))

    def in_final(t: pa.Table, _ref=fin_ref) -> pa.Table:
        c, v = comp_of(t)
        wts = wts_of(t)
        flos, fhis = _ray.get(_ref)
        idx = np.searchsorted(flos, c, side="right") - 1
        idx = np.maximum(idx, 0)
        keep = (c >= flos[idx]) & (c < fhis[idx])
        return pa.table(
            {
                "iv": pa.array(idx[keep].astype(np.int64)),
                "v": pa.array(v[keep]),
                "w": pa.array(
                    (np.ones(int(keep.sum()), np.int64) if wts is None
                     else wts[keep])
                ),
            }
        )

    frows = ds.map_batches(in_final, batch_format="pyarrow").take_all()
    by_iv: dict[int, list[tuple[float, int]]] = {}
    for r in frows:
        by_iv.setdefault(int(r["iv"]), []).append((float(r["v"]), int(r["w"])))
    out: list[tuple[object, float, float]] = []
    for i, (_lo, _hi, targs) in enumerate(resolved):
        pairs = sorted(by_iv[i])
        cum = np.cumsum([w for _, w in pairs])
        for oi, local_rank in targs:
            gi, fi = divmod(oi, len(fractions))
            out.append(
                (
                    groups_sorted[gi],
                    float(fractions[fi]),
                    pairs[int(np.searchsorted(cum, local_rank, side="left"))][0],
                )
            )
    # native group order (groups_sorted's order), matching the grouped
    # rank-kernel twin and SQL ORDER BY on the group column
    gpos = {g: i for i, g in enumerate(groups_sorted)}
    out.sort(key=lambda x: (gpos[x[0]], x[1]))
    return out


def rank_weighted_sum_cents(
    ds: "ray.data.Dataset",
    value_col: str,
    *,
    bucket_w: int = 1_000,
    num_partitions: int = 16,
    max_buckets: int = 2_000_000,
) -> tuple[int, int, int]:
    """Exact ``(n, sum_v, sum_i*v)`` over a non-negative money column,
    where ``i`` is the 1-based ascending rank of each row's value (any
    order among ties — the tied values are equal, so ``sum i*v`` is
    invariant). This is the distributed core of rank statistics such as
    the Gini coefficient, without ever sorting the corpus globally on
    the driver or gathering a distinct-value histogram.

    Two passes, both corpus-streaming:

    1. A coarse ``cents // bucket_w`` histogram (per-batch partial →
       one small groupby) gives per-bucket counts driver-side; the
       gather is VALUE-DOMAIN-bounded (``range/bucket_w`` rows, guarded
       by ``max_buckets``), independent of row count. Prefix sums give
       each bucket its global rank offset ``C_b``.
    2. Rows pre-reduce per batch to distinct ``(cents, count)`` pairs,
       take ONE hash-partition shuffle keyed by bucket (all rows of a
       bucket co-locate; bucket order == cents order, so within-bucket
       ranks complete locally), and each partition computes
       ``sum_j v_j * (k_j*(C_b + K_<j) + k_j*(k_j+1)/2)`` in exact
       Python ints (the moment exceeds int64 at warehouse scale —
       per-partition partials ship as decimal STRINGS, the established
       beyond-int64 discipline).

    Skew: a single hot value lands in one partition as one big
    vectorized combine + a distinct-value-sized exact reduce — graceful
    degradation, not OOM (hash-join caveat, as in ``joins``).
    """
    import pyarrow.compute as pc

    import ray as _ray

    def to_cents(t: pa.Table) -> np.ndarray:
        v = t.column(value_col).to_numpy(zero_copy_only=False)
        c = np.floor(v * 100.0 + 0.5).astype(np.int64)
        if c.size and c.min() < 0:
            raise ValueError("rank_weighted_sum_cents: negative value")
        return c

    # ---- pass 1: coarse bucket histogram (domain-bounded gather) ------
    def hist(t: pa.Table) -> pa.Table:
        c = to_cents(t)
        u, k = np.unique(c // bucket_w, return_counts=True)
        return pa.table(
            {"b": pa.array(u), "n": pa.array(k.astype(np.int64))}
        )

    rows = _hash_sum_rows(ds.map_batches(hist, batch_format="pyarrow"), "b", "n")
    if not rows:
        return 0, 0, 0
    if len(rows) > max_buckets:
        raise ValueError(
            f"rank_weighted_sum_cents: {len(rows)} buckets "
            f"(> max_buckets={max_buckets}); raise bucket_w."
        )
    rows.sort(key=lambda r: int(r["b"]))
    bks = np.asarray([int(r["b"]) for r in rows], dtype=np.int64)
    cnts = [int(r["n"]) for r in rows]
    n_total = sum(cnts)
    # prefix counts can exceed int64 only beyond 9e18 rows; int64 is fine,
    # but the OFFSET enters the >int64 Python-int reduce below anyway.
    pref = np.concatenate([[0], np.cumsum(cnts)])[:-1].astype(np.int64)
    pref_ref = _ray.put((bks, pref))

    # ---- pass 2: distinct-(cents,count) partials, bucket-keyed shuffle -
    def partial(t: pa.Table) -> pa.Table:
        c = to_cents(t)
        u, k = np.unique(c, return_counts=True)
        part = _bucket_part(u // bucket_w, num_partitions)
        return pa.table(
            {
                "c": pa.array(u),
                "k": pa.array(k.astype(np.int64)),
                "_p": pa.array(part),
            }
        )

    def reduce_part(t: pa.Table, ref=pref_ref) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"siv": pa.array([], pa.string()), "sv": pa.array([], pa.string())}
            )
        b_sorted, p_sorted = _ray.get(ref)
        gt = t.group_by("c").aggregate([("k", "sum")])
        c = gt.column("c").to_numpy(zero_copy_only=False)
        k = gt.column("k_sum").to_numpy(zero_copy_only=False)
        order = np.argsort(c)
        c, k = c[order], k[order]
        b = c // bucket_w
        # within-bucket exclusive prefix of counts (K_<j), vectorized
        csum = np.cumsum(k) - k
        starts = np.concatenate([[True], b[1:] != b[:-1]])
        base = np.repeat(csum[starts], np.diff(np.flatnonzero(
            np.concatenate([starts, [True]]))))
        k_before = csum - base
        cb = p_sorted[np.searchsorted(b_sorted, b)]
        # exact Python-int dot: terms exceed int64 at warehouse scale
        total = 0
        sum_v = 0
        for vi, ki, kb, cbi in zip(
            c.tolist(), k.tolist(), k_before.tolist(), cb.tolist()
        ):
            total += vi * (ki * (cbi + kb) + ki * (ki + 1) // 2)
            sum_v += vi * ki
        return pa.table(
            {
                "siv": pa.array([str(total)], pa.string()),
                "sv": pa.array([str(sum_v)], pa.string()),
            }
        )

    parts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_p")
        .map_groups(reduce_part, batch_format="pyarrow")
        .take_all()  # num_partitions rows
    )
    sum_iv = sum(int(r["siv"]) for r in parts)
    sum_v = sum(int(r["sv"]) for r in parts)
    return n_total, sum_v, sum_iv


def grouped_rank_weighted_sum_cents(
    ds: "ray.data.Dataset",
    group_col: str,
    value_col: str,
    *,
    bucket_w: int = 1_000,
    num_partitions: int = 16,
    max_groups: int = 10_000,
    max_buckets: int = 2_000_000,
) -> "list[tuple[object, int, int, int]]":
    """Per-GROUP ``(group, n, sum_v, sum_i*v)`` with ``i`` the 1-based
    WITHIN-GROUP ascending value rank — :func:`rank_weighted_sum_cents`
    generalized the same way :func:`grouped_quantile_disc_unbounded`
    generalizes the global refinement: each group owns a disjoint
    composite cent domain ``gidx * 10^12 + cents``, so ALL groups share
    both corpus passes (coarse histogram, then ONE bucket-keyed shuffle
    of distinct-(key,count) partials). ``bucket_w`` must divide the
    group domain so no bucket straddles groups (enforced); per-group
    rank offsets come from the histogram prefix restricted to each
    group's domain. Moments are exact Python ints (decimal-string
    partials; HUGEINT on the oracle side). Guards: ``max_groups`` for
    the driver tables, ``max_buckets`` for the histogram gather, loud
    cent-domain/negative checks."""
    import pyarrow.compute as pc

    import ray as _ray

    if _GROUP_DOMAIN % bucket_w:
        raise ValueError("bucket_w must divide the group domain")

    # ---- group universe + per-group counts (bounded gather) -----------
    def gcounts(t: pa.Table) -> pa.Table:
        g = t.select([group_col]).group_by([group_col]).aggregate([([], "count_all")])
        return g.rename_columns([group_col, "n"])

    grows = (
        ds.map_batches(gcounts, batch_format="pyarrow")
        .groupby(group_col)
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    )
    grows = [r for r in grows if r["n"]]
    if not grows:
        return []
    if len(grows) > max_groups:
        raise ValueError(
            f"grouped_rank_weighted_sum_cents: {len(grows)} groups "
            f"(> max_groups={max_groups})"
        )
    grows.sort(key=lambda r: r[group_col])
    groups_sorted = [r[group_col] for r in grows]
    n_by_gidx = [int(r["n"]) for r in grows]
    gset_ref = _ray.put(pa.array(groups_sorted))
    GOFF = np.int64(_GROUP_DOMAIN)

    def comp_of(t: pa.Table) -> np.ndarray:
        v = t.column(value_col).to_numpy(zero_copy_only=False)
        c = np.floor(v * 100.0 + 0.5).astype(np.int64)
        if c.size and (c.min() < 0 or c.max() >= _GROUP_DOMAIN):
            raise ValueError(
                "grouped_rank_weighted_sum_cents: value outside the "
                "[0, $10^10) per-group cent domain"
            )
        gidx = pc.index_in(
            t.column(group_col), value_set=_ray.get(gset_ref)
        ).to_numpy(zero_copy_only=False)
        return gidx.astype(np.int64) * GOFF + c

    # ---- pass 1: composite coarse histogram ---------------------------
    def hist(t: pa.Table) -> pa.Table:
        u, k = np.unique(comp_of(t) // bucket_w, return_counts=True)
        return pa.table({"b": pa.array(u), "n": pa.array(k.astype(np.int64))})

    rows = _hash_sum_rows(ds.map_batches(hist, batch_format="pyarrow"), "b", "n")
    if len(rows) > max_buckets:
        raise ValueError(
            f"grouped_rank_weighted_sum_cents: {len(rows)} buckets "
            f"(> max_buckets={max_buckets}); raise bucket_w."
        )
    rows.sort(key=lambda r: int(r["b"]))
    bks = np.asarray([int(r["b"]) for r in rows], dtype=np.int64)
    cnts = np.asarray([int(r["n"]) for r in rows], dtype=np.int64)
    bgrp = (bks * bucket_w) // _GROUP_DOMAIN  # bucket's group index
    cum = np.cumsum(cnts) - cnts  # global exclusive prefix
    gstarts = np.concatenate([[True], bgrp[1:] != bgrp[:-1]])
    gbase = np.repeat(
        cum[gstarts],
        np.diff(np.flatnonzero(np.concatenate([gstarts, [True]]))),
    )
    pref_in_group = cum - gbase  # within-group rank offset per bucket
    pref_ref = _ray.put((bks, pref_in_group.astype(np.int64)))

    # ---- pass 2: distinct partials, bucket-keyed shuffle --------------
    def partial(t: pa.Table) -> pa.Table:
        u, k = np.unique(comp_of(t), return_counts=True)
        part = _bucket_part(u // bucket_w, num_partitions)
        return pa.table(
            {
                "c": pa.array(u),
                "k": pa.array(k.astype(np.int64)),
                "_p": pa.array(part),
            }
        )

    def reduce_part(t: pa.Table, ref=pref_ref) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "g": pa.array([], pa.int64()),
                    "siv": pa.array([], pa.string()),
                    "sv": pa.array([], pa.string()),
                }
            )
        b_sorted, p_sorted = _ray.get(ref)
        gt = t.group_by("c").aggregate([("k", "sum")])
        c = gt.column("c").to_numpy(zero_copy_only=False)
        k = gt.column("k_sum").to_numpy(zero_copy_only=False)
        order = np.argsort(c)
        c, k = c[order], k[order]
        b = c // bucket_w
        csum = np.cumsum(k) - k
        starts = np.concatenate([[True], b[1:] != b[:-1]])
        base = np.repeat(
            csum[starts],
            np.diff(np.flatnonzero(np.concatenate([starts, [True]]))),
        )
        k_before = csum - base
        cb = p_sorted[np.searchsorted(b_sorted, b)]
        gi = c // _GROUP_DOMAIN
        v = c % _GROUP_DOMAIN
        acc: dict[int, list[int]] = {}
        for vi, ki, kb, cbi, g in zip(
            v.tolist(), k.tolist(), k_before.tolist(), cb.tolist(), gi.tolist()
        ):
            sums = acc.setdefault(int(g), [0, 0])
            sums[0] += vi * (ki * (cbi + kb) + ki * (ki + 1) // 2)
            sums[1] += vi * ki
        gs = sorted(acc)
        return pa.table(
            {
                "g": pa.array(gs, pa.int64()),
                "siv": pa.array([str(acc[g][0]) for g in gs], pa.string()),
                "sv": pa.array([str(acc[g][1]) for g in gs], pa.string()),
            }
        )

    parts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_p")
        .map_groups(reduce_part, batch_format="pyarrow")
        .take_all()  # <= num_partitions x |groups| rows
    )
    siv_by_g: dict[int, int] = {}
    sv_by_g: dict[int, int] = {}
    for r in parts:
        g = int(r["g"])
        siv_by_g[g] = siv_by_g.get(g, 0) + int(r["siv"])
        sv_by_g[g] = sv_by_g.get(g, 0) + int(r["sv"])
    return [
        (groups_sorted[g], n_by_gidx[g], sv_by_g.get(g, 0), siv_by_g.get(g, 0))
        for g in range(len(groups_sorted))
    ]
