"""Edit-distance-<=1 similarity join via deletion neighborhoods.

Fuzzy matching of SHORT strings (titles, product names, anchor text) is
the record-linkage staple the other dedup families cannot express: one
typo breaks every exact hash, and shingle sets of a 20-char name are too
small for stable minhash bands. The classic scale answer (Garbe's
SymSpell, public domain) inverts the problem: two strings are within
edit distance 1 iff they share a key in ``{s} ∪ deletions1(s)`` —

- substitution at position i collides on deleting i from BOTH sides,
- insertion collides on the shorter string's IDENTITY key,
- equality collides on the identity key,

so candidate generation is a pure per-batch flat-map emitting ``L+1``
keys per string, ONE key-keyed exchange groups colliding strings, and
the exact verify runs inside each group over candidate pairs only —
never all pairs. A key collision already bounds the distance at 2, so
the verify loop is candidate-proportional (≈ output-sized on real
corpora).

Scale shape:
- emit map: ``L+1`` short rows per string over a BOUNDED-length column
  (names); corpus × (L+1) rows of (key-hash u64, id, name);
- ONE hash-partition exchange on the key hash (the ``_band_candidates``
  pattern, ``dedup.py:300`` — partition-wise lexsort + per-bucket loop
  over >=2-member buckets, never per-key ``map_groups`` dispatch);
- the verify runs once per DISTINCT-name pair and expands duplicate-name
  id cliques as vectorized cross products;
- every pair is emitted EXACTLY ONCE — from the bucket of its minimum
  shared key (both sides recompute the neighborhood intersection
  locally), so no global distinct exchange follows the one shuffle.

Bucket identity is the md5 of the exact deletion key; an md5 collision
can only ADD candidates, which the exact verify then drops — the output
pair set is collision-proof. Giant buckets (thousands of names within
distance 1 of one key) would make the in-bucket pairing quadratic; the
exact-pair contract here cannot star-cap them the way the clustering
families do (a star DROPS true pairs, and this operator's output IS the
pair set), so above ``EDIT1_BUCKET_CAP`` the operator fails loudly —
the ``exact_quantiles`` guard discipline — instead of silently burning
a partition. Callers with adversarial key skew should pre-block (e.g.
length + first-char) before the join.

The construction is md5-free in its SEMANTICS (md5 only buckets), so
the SQL oracle reproduces it exactly: lateral ``generate_series``
deletions, a self-join on the key, and ``levenshtein() <= 1``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from .dedup import md5_u64

__all__ = ["EDIT1_BUCKET_CAP", "edit1_pairs", "edit_le1"]


def _neighborhood(name: str) -> set:
    """``{s} ∪ deletions1(s)`` — the key set ``emit_keys`` mirrors."""
    return {name} | {name[:p] + name[p + 1 :] for p in range(len(name))}

# Above this many members in one deletion-key bucket the exhaustive
# in-bucket pairing is quadratic with no exact shortcut available; fail
# loudly (see module docstring) rather than degrade silently.
EDIT1_BUCKET_CAP = 4096

_NUM_PARTS = 32


def edit_le1(a: str, b: str) -> bool:
    """Exact edit-distance <= 1 check, O(len) two-pointer."""
    la, lb = len(a), len(b)
    if la > lb:
        a, b, la, lb = b, a, lb, la
    if lb - la > 1:
        return False
    if la == lb:
        if a == b:
            return True
        seen = False
        for x, y in zip(a, b):
            if x != y:
                if seen:
                    return False
                seen = True
        return True
    # one insertion: skip exactly one char of b
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1 :]


def edit1_pairs(
    ds: "ray.data.Dataset",
    id_col: str,
    name_col: str,
    bucket_cap: int = EDIT1_BUCKET_CAP,
    num_parts: int = _NUM_PARTS,
) -> "ray.data.Dataset":
    """All (id_a < id_b) pairs whose ``name_col`` values are within edit
    distance 1 (including exact duplicates). Returns a Dataset with
    columns ``(id_a, id_b)``."""

    def emit_keys(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_pylist()
        names = t.column(name_col).to_pylist()
        out_h: list[int] = []
        out_i: list[int] = []
        out_n: list[str] = []
        for i, nm in zip(ids, names):
            if nm is None:
                # mirror the SQL oracle exactly: generate_series over a
                # NULL length yields no key rows and levenshtein(NULL, x)
                # is NULL, so null names join NOTHING — coercing to ''
                # would instead clique every null row together
                continue
            # identity key + every single-char deletion
            out_h.append(md5_u64(nm))
            out_i.append(i)
            out_n.append(nm)
            for p in range(len(nm)):
                out_h.append(md5_u64(nm[:p] + nm[p + 1 :]))
                out_i.append(i)
                out_n.append(nm)
        hu = np.array(out_h, dtype=np.uint64)
        return pa.table(
            {
                "_part": pa.array((hu % num_parts).astype(np.int32)),
                "key_u64": pa.array(hu),
                "id": pa.array(out_i, pa.int64()),
                "name": pa.array(out_n, pa.string()),
            }
        )

    empty = pa.table(
        {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())}
    )

    def emit_verified(part: pa.Table) -> pa.Table:
        if part.num_rows < 2:
            return empty
        key = part.column("key_u64").to_numpy(zero_copy_only=False)
        ids = part.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
        names = part.column("name").to_pylist()
        order = np.lexsort((ids, key))
        key, ids = key[order], ids[order]
        names = [names[j] for j in order]
        change = np.flatnonzero(key[1:] != key[:-1]) + 1
        starts = np.concatenate([[0], change])
        ends = np.concatenate([change, [len(ids)]])
        names_arr = np.array(names, dtype=object)
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        for s, e in zip(starts, ends):
            m = int(e - s)
            if m < 2:
                continue
            if m > bucket_cap:
                raise ValueError(
                    f"edit1_pairs: deletion-key bucket has {m} members "
                    f"(> {bucket_cap}); the exact pair set is quadratic "
                    "there. Pre-block the input (length/prefix) or raise "
                    "bucket_cap explicitly."
                )
            bucket_key = int(key[s])
            # verify once per DISTINCT-name pair, then expand id cross
            # products vectorized — duplicate-name cliques (the common
            # case on real catalogs) cost C(u,2) string checks for u
            # distinct names instead of C(m,2) for m member ids
            gnames, inv = np.unique(names_arr[s:e], return_inverse=True)
            gids = ids[s:e]
            # unique ids per name group: one string can reach the same
            # key via two different deletions (e.g. "aab" -> "ab"), so
            # an id may repeat inside a bucket
            groups = [np.unique(gids[inv == gi]) for gi in range(len(gnames))]
            nbhd = [_neighborhood(nm) for nm in gnames]
            for gi, ga in enumerate(groups):
                # identical names (distance 0) share EVERY key; emit the
                # clique only from the name's identity bucket so each
                # pair fires exactly once globally
                if len(ga) >= 2 and md5_u64(gnames[gi]) == bucket_key:
                    ii, jj = np.triu_indices(len(ga), k=1)
                    out_a.append(np.minimum(ga[ii], ga[jj]))
                    out_b.append(np.maximum(ga[ii], ga[jj]))
                for gj in range(gi + 1, len(gnames)):
                    if not edit_le1(gnames[gi], gnames[gj]):
                        continue
                    # min-shared-key rule: a verified pair appears in
                    # every bucket its neighborhoods share; both sides
                    # can recompute that intersection locally, so only
                    # the minimum-hash shared key's bucket emits — no
                    # global distinct exchange is needed downstream
                    shared = nbhd[gi] & nbhd[gj]
                    if min(md5_u64(k) for k in shared) != bucket_key:
                        continue
                    xx, yy = np.meshgrid(ga, groups[gj], indexing="ij")
                    xx, yy = xx.ravel(), yy.ravel()
                    out_a.append(np.minimum(xx, yy))
                    out_b.append(np.maximum(xx, yy))
        if not out_a:
            return empty
        return pa.table(
            {
                "id_a": pa.array(np.concatenate(out_a), pa.int64()),
                "id_b": pa.array(np.concatenate(out_b), pa.int64()),
            }
        )

    keyed = ds.map_batches(emit_keys, batch_format="pyarrow")
    return keyed.groupby("_part").map_groups(
        emit_verified, batch_format="pyarrow"
    )
