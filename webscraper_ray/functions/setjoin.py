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

__all__ = ["similarity_join"]


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
    j_idx = np.repeat(np.arange(ns.size), counts)
    offs = np.cumsum(counts) - counts
    i_idx = np.arange(total) - np.repeat(offs, counts) + np.repeat(lo, counts)
    a, b = ids[i_idx], ids[j_idx]
    doc_a, doc_b = np.minimum(a, b), np.maximum(a, b)
    keep = doc_a != doc_b  # same doc twice can't happen; equal ids can't
    # POSITIONAL filter (PPJoin): at this shared hash the overlap can't
    # exceed 1 + min(remaining suffix of either side); a TRUE pair's
    # occurrence at its minimum common element always passes (its
    # position precedes all other common elements on both sides), so
    # pruning failing occurrences never loses a pair — it only stops
    # junk collisions from reaching the verify join.
    na, nb = ns[i_idx], ns[j_idx]
    alpha = np.ceil(
        threshold / (1.0 + threshold) * (na + nb) - 1e-9
    ).astype(np.int64)
    ub = 1 + np.minimum(na - pos[i_idx] - 1, nb - pos[j_idx] - 1)
    keep &= ub >= alpha
    return pa.table(
        {"doc_a": pa.array(doc_a[keep]), "doc_b": pa.array(doc_b[keep])}
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
