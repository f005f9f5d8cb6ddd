"""Exact set-similarity self-join via prefix filtering (PPJoin-style).

Unlike the LSH families in :mod:`webscraper_ray.functions.dedup` (band
candidates can MISS true pairs with signature-estimate probability),
this join is EXACT: every pair of documents whose distinct-3-shingle
Jaccard reaches the threshold is guaranteed to surface. The classical
prefix-filtering principle (Chaudhuri et al., ICDE'06; Xiao et al.,
WWW'08 — public literature) under an arbitrary global total order of
the element universe: if ``|A∩B| >= ceil(t*max(|A|,|B|))`` — implied by
``J(A,B) >= t`` — then the MINIMUM common element m has rank
``<= |X| - ceil(t*|X|) + 1`` in BOTH sets, i.e. both per-set prefixes
contain m. The md5-u64 hash order serves as the global order, so no
corpus-wide frequency pass or driver-held rank table is needed — the
whole candidate stage is one hash-keyed exchange of PREFIX rows only
(|X| - ceil(t|X|) + 1 per doc, a (1-t) fraction of the shingle mass).

Per prefix-hash group, the size filter ``|A| >= t*|B|`` (necessary for
``J >= t``) prunes pairs before emission via one searchsorted over the
group's sorted sizes. Inherent worst case, documented: a boilerplate
shingle shared verbatim by m docs whose sizes all pass the filter emits
O(m^2) candidates — unavoidable for an EXACT join (the true result
itself can be quadratic); the hash-distinct + distributed verify stages
downstream are pair-count-sized, so a hot group degrades throughput,
not correctness or driver memory.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

import ray.data

from .dedup import (
    _hash_distinct,
    _shingles,
    exact_jaccard_verify,
    md5_u64,
)

__all__ = ["similarity_join", "containment_join"]


def _prefix_rows(
    t: pa.Table, id_col: str, text_col: str, threshold: float
) -> pa.Table:
    """(prefix_hash, doc_id, n_shingles) rows — prefix = the smallest
    ``n - ceil(t*n) + 1`` hashes of each doc's sorted shingle-hash set."""
    ph, ids, sizes, poss = [], [], [], []
    for doc, text in zip(
        t.column(id_col).to_pylist(), t.column(text_col).to_pylist()
    ):
        sh = _shingles(text or "")
        if not sh:
            continue
        h = np.sort(np.fromiter((md5_u64(s) for s in sh), dtype=np.uint64))
        p = h.size - math.ceil(threshold * h.size) + 1
        ph.append(h[:p])
        ids.append(np.full(p, doc, dtype=np.int64))
        sizes.append(np.full(p, h.size, dtype=np.int64))
        poss.append(np.arange(p, dtype=np.int64))
    if not ph:
        return pa.table(
            {
                "ph": pa.array([], pa.int64()),
                "doc_id": pa.array([], pa.int64()),
                "n_sh": pa.array([], pa.int64()),
                "pos": pa.array([], pa.int64()),
            }
        )
    return pa.table(
        {
            # uint64 view as int64: bit-identical key, arrow-native type
            "ph": pa.array(np.concatenate(ph).view(np.int64)),
            "doc_id": pa.array(np.concatenate(ids)),
            "n_sh": pa.array(np.concatenate(sizes)),
            "pos": pa.array(np.concatenate(poss)),
        }
    )


def _partition_pairs(t: pa.Table, threshold: float) -> pa.Table:
    """All (a, b) doc pairs sharing a prefix hash within one hash
    partition, passing the size filter ``n_small >= t * n_large`` —
    every prefix-hash group of the partition is processed in ONE
    lexsort + per-group searchsorted emission (Ray's sort-based
    groupby pays seconds on the ~corpus-shingle-count key space;
    hash-partitioning + in-partition run grouping does not)."""
    empty = pa.table(
        {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())}
    )
    if t.num_rows < 2:
        return empty
    ph = t.column("ph").to_numpy(zero_copy_only=False)
    ids = t.column("doc_id").to_numpy(zero_copy_only=False)
    ns = t.column("n_sh").to_numpy(zero_copy_only=False)
    pos = t.column("pos").to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, ns, ph))
    ph, ids, ns, pos = ph[order], ids[order], ns[order], pos[order]
    grp_start = np.r_[True, ph[1:] != ph[:-1]]
    starts = np.flatnonzero(grp_start)
    seg = np.cumsum(grp_start) - 1
    seg_start = starts[seg]
    # for each j, partners i in [lo_j, j) of the SAME group need
    # ns[i] >= t * ns[j]; the group-offset trick from range_rolling makes
    # one global searchsorted answer every per-group probe: shift each
    # group's sizes onto disjoint ranges (sizes are < 2^32, so
    # group_index << 33 never collides)
    if seg[-1] >= (1 << 29):
        raise OverflowError(
            "similarity_join: too many prefix-hash groups in one "
            "partition for the int64 shift domain; raise num_parts"
        )
    base = seg.astype(np.int64) << np.int64(33)
    shifted = ns + base
    tgt_n = np.ceil(threshold * ns - 1e-9).astype(np.int64)
    lo = np.maximum(np.searchsorted(shifted, tgt_n + base, side="left"), seg_start)
    counts = np.maximum(np.arange(ns.size) - lo, 0)
    total = int(counts.sum())
    if total == 0:
        return empty
    # Chunked emission + periodic in-partition dedup — same shape and
    # same rationale as `_cont_partition_pairs`: a hot shingle shared by
    # m docs emits O(m^2) rows per prefix hash and a high-duplication
    # corpus repeats each pair across ~every prefix hash; the one-shot
    # np.repeat over all emissions OOM-killed workers and filled the
    # spill disk at the 100x stress point. Only DISTINCT pairs leave the
    # partition; the final pair set (and the oracle) is unchanged.
    c = np.cumsum(counts)
    chunk = 1 << 23
    # single-slice fast path: when the whole partition's emissions fit
    # one slice (every realistic corpus; the memory bound the chunking
    # exists for is inherently satisfied), emit exactly as before the
    # chunking — no in-partition dedup, the downstream cross-partition
    # distinct handles it. The dedup work only pays for itself at
    # stress-corpus volumes, where it cuts the exchange ~10-30x; paying
    # it at sf0.1 measured ~40% on the whole query.
    one_slice = int(c[-1]) <= chunk
    if one_slice:
        bounds = np.array([0, counts.size])
    else:
        cuts = np.searchsorted(c, np.arange(chunk, int(c[-1]) + chunk, chunk))
        bounds = np.unique(np.r_[0, cuts + 1, counts.size])
    acc: list[np.ndarray] = []
    acc_rows = 0
    # geometric compaction threshold: re-compacting at a FIXED size is
    # quadratic when the pairs are genuinely distinct (each compaction
    # lexsorts the whole accumulator and shrinks nothing); doubling the
    # threshold after each compaction keeps the total sort work
    # O(n log n) of the final distinct size, which the partition must
    # hold to return anyway
    compact_at = 1 << 25
    for s_i, e_i in zip(bounds[:-1], bounds[1:]):
        cts = counts[s_i:e_i]
        tot = int(cts.sum())
        if tot == 0:
            continue
        j_idx = np.repeat(np.arange(s_i, e_i), cts)
        offs = np.cumsum(cts) - cts
        i_idx = np.arange(tot) - np.repeat(offs, cts) + np.repeat(lo[s_i:e_i], cts)
        a, b = ids[i_idx], ids[j_idx]
        doc_a, doc_b = np.minimum(a, b), np.maximum(a, b)
        keep = doc_a != doc_b  # same doc twice can't happen; equal ids can't
        # POSITIONAL filter (PPJoin): at this shared hash the overlap
        # can't exceed 1 + min(remaining suffix of either side); a TRUE
        # pair's occurrence at its minimum common element always passes
        # (its position precedes all other common elements on both
        # sides), so pruning failing occurrences never loses a pair —
        # it only stops junk collisions from reaching the verify join.
        na, nb = ns[i_idx], ns[j_idx]
        alpha = np.ceil(
            threshold / (1.0 + threshold) * (na + nb) - 1e-9
        ).astype(np.int64)
        ub = 1 + np.minimum(na - pos[i_idx] - 1, nb - pos[j_idx] - 1)
        keep &= ub >= alpha
        if not keep.any():
            continue
        if one_slice:
            return pa.table(
                {"doc_a": pa.array(doc_a[keep]), "doc_b": pa.array(doc_b[keep])}
            )
        pairs_chunk = _uniq_pairs(doc_a[keep], doc_b[keep])
        acc.append(pairs_chunk)
        acc_rows += pairs_chunk.shape[0]
        if acc_rows > compact_at:
            cat = np.concatenate(acc, axis=0)
            merged = _uniq_pairs(cat[:, 0], cat[:, 1])
            acc, acc_rows = [merged], merged.shape[0]
            compact_at = max(1 << 25, 2 * acc_rows)
    if not acc:
        return empty
    cat = np.concatenate(acc, axis=0)
    merged = _uniq_pairs(cat[:, 0], cat[:, 1])
    return pa.table(
        {"doc_a": pa.array(merged[:, 0]), "doc_b": pa.array(merged[:, 1])}
    )


def similarity_join(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
) -> "ray.data.Dataset":
    """Exact-recall ``(doc_a, doc_b, jaccard)`` pairs with distinct-
    3-shingle Jaccard >= ``threshold``. Candidates from prefix
    filtering (module docstring), verified by the shared distributed
    exact-Jaccard machinery."""
    import ray  # noqa: F401

    from .joins import _part_column

    prefix = ds.map_batches(
        lambda t: _prefix_rows(t, id_col, text_col, threshold),
        batch_format="pyarrow",
    )

    def add_part(t: pa.Table) -> pa.Table:
        return t.append_column("_p", _part_column(t.column("ph"), 32))

    cands = (
        prefix.map_batches(add_part, batch_format="pyarrow")
        .groupby("_p")
        .map_groups(lambda t: _partition_pairs(t, threshold), batch_format="pyarrow")
    )
    pairs = _hash_distinct(cands, ["doc_a", "doc_b"]).materialize()
    n_pairs = pairs.count()
    if n_pairs == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_a": pa.array([], pa.int64()),
                    "doc_b": pa.array([], pa.int64()),
                    "jaccard": pa.array([], pa.float64()),
                }
            )
        )
    return exact_jaccard_verify(
        pairs, ds, id_col, text_col, "doc_a", "doc_b", n_pairs, threshold
    ).sort(["doc_a", "doc_b"])


# ---------------------------------------------------------------------------
# Exact containment (overlap-coefficient) self-join
# ---------------------------------------------------------------------------


def _uniq_pairs(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Distinct (a, b) rows as an (n, 2) int64 array.

    Fast path: ids in [0, 2^31) (every corpus this engine generates or
    ingests by default) pack into ONE uint64 and dedupe with a
    single-key ``np.unique`` — one C sort instead of the two indirect
    argsorts of ``np.lexsort`` (~4x) and ~10x over the void-dtype sort
    of ``np.unique(axis=0)``, which dominated the chunked emission at
    the 100x stress point. Anything outside the packable domain falls
    back to lexsort + neighbor-diff, same result."""
    if a.size == 0:
        return np.empty((0, 2), dtype=np.int64)
    if (
        min(int(a.min()), int(b.min())) >= 0
        and max(int(a.max()), int(b.max())) < (1 << 31)
    ):
        packed = (a.astype(np.uint64) << np.uint64(32)) | b.astype(np.uint64)
        u = np.unique(packed)
        return np.stack(
            [
                (u >> np.uint64(32)).astype(np.int64),
                (u & np.uint64(0xFFFFFFFF)).astype(np.int64),
            ],
            axis=1,
        )
    order = np.lexsort((b, a))
    a, b = a[order], b[order]
    keep = np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
    return np.stack([a[keep], b[keep]], axis=1)


def _cont_rows(
    t: pa.Table, id_col: str, text_col: str, threshold: float
) -> pa.Table:
    """Two row kinds per doc for the overlap-coefficient prefix filter:
    role 0 = the doc's prefix (smallest ``n - ceil(t*n) + 1`` hashes —
    the side that plays the SMALLER set), role 1 = every hash (the side
    that plays the LARGER set; overlap >= t*min constrains only the
    smaller set's prefix, so the larger side must be fully indexed —
    the published cost of an exact overlap join, ~(2-t)x the shingle
    mass, still one hash-keyed exchange)."""
    ph, ids, sizes, poss, roles = [], [], [], [], []
    for doc, text in zip(
        t.column(id_col).to_pylist(), t.column(text_col).to_pylist()
    ):
        sh = _shingles(text or "")
        if not sh:
            continue
        h = np.sort(np.fromiter((md5_u64(s) for s in sh), dtype=np.uint64))
        p = h.size - math.ceil(threshold * h.size) + 1
        for role, k in ((0, p), (1, h.size)):
            ph.append(h[:k])
            ids.append(np.full(k, doc, dtype=np.int64))
            sizes.append(np.full(k, h.size, dtype=np.int64))
            poss.append(np.arange(k, dtype=np.int64))
            roles.append(np.full(k, role, dtype=np.int8))
    if not ph:
        return pa.table(
            {
                "ph": pa.array([], pa.int64()),
                "doc_id": pa.array([], pa.int64()),
                "n_sh": pa.array([], pa.int64()),
                "pos": pa.array([], pa.int64()),
                "role": pa.array([], pa.int8()),
            }
        )
    return pa.table(
        {
            "ph": pa.array(np.concatenate(ph).view(np.int64)),
            "doc_id": pa.array(np.concatenate(ids)),
            "n_sh": pa.array(np.concatenate(sizes)),
            "pos": pa.array(np.concatenate(poss)),
            "role": pa.array(np.concatenate(roles)),
        }
    )


def _cont_partition_pairs(t: pa.Table, threshold: float) -> pa.Table:
    """(a, b) pairs within one hash partition: a prefix row meets the
    full-index rows of every no-smaller doc sharing the hash, with the
    PPJoin positional upper bound pruning junk collisions (a true
    pair's minimum common element always survives it — its position
    precedes every other common element on both sides)."""
    empty = pa.table(
        {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())}
    )
    if t.num_rows < 2:
        return empty
    ph = t.column("ph").to_numpy(zero_copy_only=False)
    ids = t.column("doc_id").to_numpy(zero_copy_only=False)
    ns = t.column("n_sh").to_numpy(zero_copy_only=False)
    pos = t.column("pos").to_numpy(zero_copy_only=False)
    role = t.column("role").to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, ns, role, ph))
    ph, ids, ns, pos, role = (
        ph[order],
        ids[order],
        ns[order],
        pos[order],
        role[order],
    )
    grp_start = np.r_[True, ph[1:] != ph[:-1]]
    seg = np.cumsum(grp_start) - 1
    if seg[-1] >= (1 << 29):
        raise OverflowError(
            "containment_join: too many prefix-hash groups in one "
            "partition for the int64 shift domain; raise num_parts"
        )
    base = seg.astype(np.int64) << np.int64(33)
    m0 = role == 0
    m1 = ~m0
    if not m0.any() or not m1.any():
        return empty
    arr1 = ns[m1] + base[m1]  # full-index rows, shifted per group
    ends1 = np.cumsum(
        np.bincount(seg[m1], minlength=int(seg[-1]) + 1)
    )  # per-group end offset inside arr1
    probes = ns[m0] + base[m0]
    lo = np.searchsorted(arr1, probes, side="left")
    hi = ends1[seg[m0]]
    counts = np.maximum(hi - lo, 0)
    total = int(counts.sum())
    if total == 0:
        return empty
    id0, n0, p0 = ids[m0], ns[m0], pos[m0]
    id1, n1, p1 = ids[m1], ns[m1], pos[m1]
    # Chunked emission with periodic in-partition dedup. A hot shingle
    # shared by m docs emits O(m^2) candidate rows per prefix hash, and
    # a high-duplication corpus repeats each pair across ~every prefix
    # hash: at the 100x stress point the one-shot np.repeat over all
    # emissions (~3B rows) OOM-killed workers and then filled the spill
    # disk through the downstream distinct exchange. Emissions now
    # stream in ~8M-row vectorized slices, each slice dedupes, and the
    # accumulator compacts to distinct pairs past 32M rows — per-task
    # memory is bounded by the compaction window instead of sum(m^2),
    # and only DISTINCT pairs leave the partition. The final pair SET
    # (and the oracle) is unchanged: the cross-partition _hash_distinct
    # collapsed the duplicate emissions anyway.
    c = np.cumsum(counts)
    chunk = 1 << 23
    # single-slice fast path — see `_partition_pairs`: realistic corpora
    # fit one slice and skip the in-partition dedup entirely
    one_slice = int(c[-1]) <= chunk
    if one_slice:
        bounds = np.array([0, counts.size])
    else:
        cuts = np.searchsorted(c, np.arange(chunk, int(c[-1]) + chunk, chunk))
        bounds = np.unique(np.r_[0, cuts + 1, counts.size])
    acc: list[np.ndarray] = []
    acc_rows = 0
    # geometric compaction threshold: re-compacting at a FIXED size is
    # quadratic when the pairs are genuinely distinct (each compaction
    # lexsorts the whole accumulator and shrinks nothing); doubling the
    # threshold after each compaction keeps the total sort work
    # O(n log n) of the final distinct size, which the partition must
    # hold to return anyway
    compact_at = 1 << 25
    for s_i, e_i in zip(bounds[:-1], bounds[1:]):
        cts = counts[s_i:e_i]
        tot = int(cts.sum())
        if tot == 0:
            continue
        j_idx = np.repeat(np.arange(s_i, e_i), cts)  # prefix-row index
        offs = np.cumsum(cts) - cts
        i_idx = np.arange(tot) - np.repeat(offs, cts) + np.repeat(lo[s_i:e_i], cts)
        a, b = id0[j_idx], id1[i_idx]
        keep = a != b
        # positional bound: overlap <= 1 + min(remaining suffixes); a
        # true pair needs >= ceil(t * n_small) and here n_small = the
        # prefix row's n (the size filter made the other side no smaller)
        alpha = np.ceil(threshold * n0[j_idx] - 1e-9).astype(np.int64)
        ub = 1 + np.minimum(
            n0[j_idx] - p0[j_idx] - 1, n1[i_idx] - p1[i_idx] - 1
        )
        keep &= ub >= alpha
        if not keep.any():
            continue
        if one_slice:
            return pa.table(
                {
                    "doc_a": pa.array(np.minimum(a, b)[keep]),
                    "doc_b": pa.array(np.maximum(a, b)[keep]),
                }
            )
        pairs_chunk = _uniq_pairs(np.minimum(a, b)[keep], np.maximum(a, b)[keep])
        acc.append(pairs_chunk)
        acc_rows += pairs_chunk.shape[0]
        if acc_rows > compact_at:
            cat = np.concatenate(acc, axis=0)
            merged = _uniq_pairs(cat[:, 0], cat[:, 1])
            acc, acc_rows = [merged], merged.shape[0]
            compact_at = max(1 << 25, 2 * acc_rows)
    if not acc:
        return empty
    cat = np.concatenate(acc, axis=0)
    merged = _uniq_pairs(cat[:, 0], cat[:, 1])
    return pa.table(
        {
            "doc_a": pa.array(merged[:, 0]),
            "doc_b": pa.array(merged[:, 1]),
        }
    )


def exact_overlap_verify(
    pairs: "ray.data.Dataset",
    ds: "ray.data.Dataset",
    id_col: str,
    text_col: str,
    n_pairs: int,
    threshold: float,
) -> "ray.data.Dataset":
    """TRUE overlap coefficient |A∩B| / min(|A|,|B|) of each candidate
    pair — the same distributed shape as ``dedup.exact_jaccard_verify``
    (involved-docs filter, shingle-hash join on both pair sides, one
    vectorized-per-pair pass), different similarity functional."""
    from .dedup import _involved_docs, _join_pair_sides, shingle_hash_table

    involved = _involved_docs(ds, pairs, id_col, text_col, "doc_a", "doc_b")
    hash_ds = involved.map_batches(
        lambda t: shingle_hash_table(t, id_col, text_col),
        batch_format="pyarrow",
    ).materialize()

    def verify(t: pa.Table) -> pa.Table:
        out_a, out_b, out_c = [], [], []
        for a, b, ha, hb in zip(
            t.column("doc_a").to_pylist(),
            t.column("doc_b").to_pylist(),
            t.column("hashes_a").to_pylist(),
            t.column("hashes_b").to_pylist(),
        ):
            va = np.frombuffer(ha, dtype=np.uint64)
            vb = np.frombuffer(hb, dtype=np.uint64)
            inter = np.intersect1d(va, vb, assume_unique=True).size
            cont = inter / min(va.size, vb.size)
            if cont >= threshold:
                out_a.append(int(a))
                out_b.append(int(b))
                out_c.append(cont)
        return pa.table(
            {
                "doc_a": pa.array(out_a, pa.int64()),
                "doc_b": pa.array(out_b, pa.int64()),
                "containment": pa.array(out_c, pa.float64()),
            }
        )

    return _join_pair_sides(
        pairs, hash_ds, id_col, "doc_a", "doc_b", "hashes", n_pairs
    ).map_batches(verify, batch_format="pyarrow")


def containment_join(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.7,
) -> "ray.data.Dataset":
    """Exact-recall ``(doc_a, doc_b, containment)`` pairs whose
    distinct-3-shingle OVERLAP COEFFICIENT ``|A∩B| / min(|A|,|B|)``
    reaches ``threshold`` — the asymmetric near-CONTAINMENT dedup a
    Jaccard join structurally misses (a short doc quoted inside a long
    one has high containment but low Jaccard, so MinHash-LSH and the
    Jaccard prefix filter both skip it). Candidates via the
    smaller-side prefix against a full index of the larger side
    (module-level `_cont_rows` note), verified by the distributed exact
    overlap machinery. Same documented hot-shingle caveat as
    :func:`similarity_join`: a boilerplate shingle shared by m docs can
    emit O(m²) candidates — throughput, not correctness or driver
    memory."""
    import ray  # noqa: F401

    from .dedup import _hash_distinct
    from .joins import _part_column

    rows = ds.map_batches(
        lambda t: _cont_rows(t, id_col, text_col, threshold),
        batch_format="pyarrow",
    )

    def add_part(t: pa.Table) -> pa.Table:
        return t.append_column("_p", _part_column(t.column("ph"), 32))

    cands = (
        rows.map_batches(add_part, batch_format="pyarrow")
        .groupby("_p")
        .map_groups(
            lambda t: _cont_partition_pairs(t, threshold),
            batch_format="pyarrow",
        )
    )
    pairs = _hash_distinct(cands, ["doc_a", "doc_b"]).materialize()
    n_pairs = pairs.count()
    if n_pairs == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_a": pa.array([], pa.int64()),
                    "doc_b": pa.array([], pa.int64()),
                    "containment": pa.array([], pa.float64()),
                }
            )
        )
    return exact_overlap_verify(
        pairs, ds, id_col, text_col, n_pairs, threshold
    ).sort(["doc_a", "doc_b"])
