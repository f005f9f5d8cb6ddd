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
- verified (id_a < id_b) pairs dedupe locally, then one output-sized
  ``_hash_distinct`` collapse.

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

from .dedup import _hash_distinct, md5_u64

__all__ = ["EDIT1_BUCKET_CAP", "edit1_pairs", "edit_le1"]

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
            nm = nm or ""
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
        out_a: list[int] = []
        out_b: list[int] = []
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
            for i in range(s, e - 1):
                ni = names[i]
                for j in range(i + 1, e):
                    if ids[i] != ids[j] and edit_le1(ni, names[j]):
                        a, b = ids[i], ids[j]
                        if a > b:
                            a, b = b, a
                        out_a.append(int(a))
                        out_b.append(int(b))
        if not out_a:
            return empty
        pairs_arr = np.unique(np.stack([out_a, out_b], axis=1), axis=0)
        return pa.table(
            {
                "id_a": pa.array(pairs_arr[:, 0], pa.int64()),
                "id_b": pa.array(pairs_arr[:, 1], pa.int64()),
            }
        )

    keyed = ds.map_batches(emit_keys, batch_format="pyarrow")
    verified = keyed.groupby("_part").map_groups(
        emit_verified, batch_format="pyarrow"
    )
    return _hash_distinct(verified, ["id_a", "id_b"], num_parts)
