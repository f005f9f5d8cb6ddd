"""Incremental near-dup detection against a PERSISTED band index.

At 100 TB nobody re-shuffles the whole corpus to dedup a daily
increment: the corpus's LSH band rows and minhash signatures are built
ONCE into a bucket-partitioned parquet store, and each new batch probes
only the band buckets it actually hashes into — the same
write-once/read-pruned discipline as the ANN store
(:func:`~webscraper_ray.functions.ann.build_ann_index`) and the crawl
page store. The sketch family (md5 shingles, 64 xor-permutation minima,
16 md5 band keys) is IDENTICAL to
:func:`~webscraper_ray.functions.dedup.minhash_near_dups`, so the whole
incremental chain stays value-hash gateable in SQL.

Store layout::

    <index_dir>/meta.json                     {"num_buckets": K}
    <index_dir>/bands/bucket=<band_i64 % K>/  (band_id, band_i64, doc_id)
    <index_dir>/sigs/bucket=<doc_id % K>/     (doc_id, sig binary)

Probe shape for an increment of n docs against an indexed corpus of N:

- the increment's band rows + signatures: map-only, increment-sized;
- the candidate join READS only the band-bucket dirs the increment
  hashes into (file-level pruning; a small increment touches a small
  fraction of the store) and exchanges only matching band rows;
- the verify READS only the sig-bucket dirs of the involved OLD ids and
  filters them map-side against a broadcast id set (candidate-sized,
  with the same loud bound discipline as ``INVOLVED_BROADCAST_MAX``);
- nothing corpus(N)-proportional ships, shuffles, or gathers.

Contract notes: the index stores band rows UNCAPPED (a store is shared
by probes of every size, so no star cap applies — a giant duplicate
cluster in the corpus makes probes that hash into it pay the full
collision fan-out; cap at curation time with the batch dedup family
instead). Build is two streaming passes (bands, then sigs) — signatures
are computed twice so neither pass materializes the corpus.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa

import ray.data

from .dedup import (
    INVOLVED_BROADCAST_MAX,
    N_HASHES,
    _band_hashes_u64,
    _hash_distinct,
    minhash_signatures_batch,
)

__all__ = ["BAND_BUCKETS", "build_band_index", "incremental_near_dups"]

BAND_BUCKETS = 32


def _bands_from_sigs(ids: list, sig_rows: list, k: int) -> pa.Table:
    """Band rows from ALREADY-COMPUTED signature rows — band hashing is
    16 md5s per doc, negligible next to the shingle minhash, so callers
    holding signatures never recompute them."""
    out_band: list[int] = []
    out_hash: list[int] = []
    out_id: list[int] = []
    for doc, sig in zip(ids, sig_rows):
        for b, bh in enumerate(_band_hashes_u64(sig)):
            out_band.append(b)
            out_hash.append(bh)
            out_id.append(doc)
    hu = np.array(out_hash, dtype=np.uint64)
    return pa.table(
        {
            "bucket": pa.array((hu % k).astype(np.int64)),
            "band_id": pa.array(out_band, pa.int32()),
            # int64 view of the u64 band hash: joinable/partitionable
            "band_i64": pa.array(hu.view(np.int64)),
            "doc_id": pa.array(out_id, pa.int64()),
        }
    )


def _band_table(batch: pa.Table, id_col: str, text_col: str, k: int) -> pa.Table:
    ids = batch.column(id_col).to_pylist()
    sigs, has = minhash_signatures_batch(batch.column(text_col).to_pylist())
    keep = np.flatnonzero(has)
    return _bands_from_sigs([ids[i] for i in keep], [sigs[i] for i in keep], k)


def _sig_table(batch: pa.Table, id_col: str, text_col: str, k: int) -> pa.Table:
    ids = batch.column(id_col)
    sigs, has = minhash_signatures_batch(batch.column(text_col).to_pylist())
    keep = np.flatnonzero(has)
    kept_ids = ids.take(pa.array(keep, pa.int64()))
    return pa.table(
        {
            "bucket": pa.array(
                (kept_ids.to_numpy(zero_copy_only=False) % k).astype(np.int64)
            ),
            "doc_id": kept_ids.cast(pa.int64()),
            "sig": pa.array([sigs[i].tobytes() for i in keep], pa.binary()),
        }
    )


def build_band_index(
    ds: "ray.data.Dataset",
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = BAND_BUCKETS,
) -> str:
    """One-time bucket-partitioned minhash store; streaming writes."""
    ds.map_batches(
        lambda t: _band_table(t, id_col, text_col, num_buckets),
        batch_format="pyarrow",
    ).write_parquet(os.path.join(index_dir, "bands"), partition_cols=["bucket"])
    ds.map_batches(
        lambda t: _sig_table(t, id_col, text_col, num_buckets),
        batch_format="pyarrow",
    ).write_parquet(os.path.join(index_dir, "sigs"), partition_cols=["bucket"])
    with open(os.path.join(index_dir, "meta.json"), "w") as f:
        json.dump({"num_buckets": num_buckets, "n_hashes": N_HASHES}, f)
    return index_dir


def _bucket_files(root: str, buckets: "set[int]") -> list[str]:
    from .textindex import bucket_files

    return bucket_files(root, buckets)


def incremental_near_dups(
    new_ds: "ray.data.Dataset",
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    jaccard_threshold: float = 0.8,
    involved_broadcast_max: int = INVOLVED_BROADCAST_MAX,
) -> "ray.data.Dataset":
    """(doc_old, doc_new, est_jaccard) pairs between the increment and
    the indexed corpus with signature agreement >= threshold."""
    meta = json.load(open(os.path.join(index_dir, "meta.json")))
    k = int(meta["num_buckets"])
    if int(meta.get("n_hashes", N_HASHES)) != N_HASHES:
        raise ValueError(
            "band index was built with a different n_hashes; rebuild it"
        )

    # ONE signature pass over the increment; band rows derive from the
    # materialized signatures (16 cheap md5s/doc), never a second
    # shingle-minhash pass
    new_core = new_ds.map_batches(
        lambda t: _sig_table(t, id_col, text_col, k), batch_format="pyarrow"
    ).materialize()

    def bands_of(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        sig_rows = [
            np.frombuffer(s, dtype=np.uint64)
            for s in t.column("sig").to_pylist()
        ]
        return _bands_from_sigs(ids, sig_rows, k)

    new_bands = new_core.map_batches(
        bands_of, batch_format="pyarrow"
    ).materialize()  # increment-sized; reused for buckets + join
    empty = pa.table(
        {
            "doc_old": pa.array([], pa.int64()),
            "doc_new": pa.array([], pa.int64()),
            "est_jaccard": pa.array([], pa.float64()),
        }
    )
    if new_bands.count() == 0:
        # empty increment (or all-too-short docs): Ray normalizes the
        # all-empty dataset to schema-less blocks that would crash the
        # group_by below — return the documented empty pair table
        return ray.data.from_arrow(empty)
    # the increment's touched buckets: a <=K-element driver set
    touched = {
        int(r["bucket"])
        for t in ray.get(new_bands.select_columns(["bucket"]).to_arrow_refs())
        for r in t.group_by("bucket").aggregate([]).to_pylist()
    }
    band_files = _bucket_files(os.path.join(index_dir, "bands"), touched)
    if not band_files:
        return ray.data.from_arrow(empty)
    # the pruned bucket store is MANY tiny files (buckets x writer
    # blocks); without coalescing Ray schedules one read task per file
    # and every downstream exchange inherits that partition count
    # (measured: 256 files -> 3.2 s join+distinct, coalesced -> ~1 s)
    old_bands = ray.data.read_parquet(
        band_files,
        columns=["band_id", "band_i64", "doc_id"],
        override_num_blocks=min(len(band_files), 8),
    ).rename_columns({"doc_id": "doc_old"})

    # partition count follows the increment's band volume, not the
    # store's file count — the join input is KB-sized here
    n_parts = max(2, min(16, new_bands.count() // 2048))
    cand = _hash_distinct(
        new_bands.select_columns(["band_id", "band_i64", "doc_id"])
        .rename_columns({"doc_id": "doc_new"})
        .join(
            old_bands,
            join_type="inner",
            num_partitions=n_parts,
            on=("band_id", "band_i64"),
        )
        .select_columns(["doc_old", "doc_new"]),
        ["doc_old", "doc_new"],
        max(4, n_parts),
    ).materialize()  # candidate-sized
    n_cand = cand.count()
    if n_cand == 0:
        return ray.data.from_arrow(empty)

    # involved OLD ids -> sig-bucket pruned read -> map-side filter
    old_ids = np.unique(
        np.concatenate(
            [
                t.column("doc_old").to_numpy(zero_copy_only=False)
                for t in ray.get(cand.select_columns(["doc_old"]).to_arrow_refs())
                if t.num_rows
            ]
        )
    )
    if old_ids.size > involved_broadcast_max:
        raise ValueError(
            f"incremental_near_dups: {old_ids.size} involved index docs "
            f"(> {involved_broadcast_max}); this increment collides with "
            "a corpus-sized slice of the store — run the batch dedup "
            "family instead."
        )
    sig_files = _bucket_files(
        os.path.join(index_dir, "sigs"), {int(i) % k for i in old_ids}
    )
    ids_ref = ray.put(old_ids)

    def keep_involved(t: pa.Table, _cache={}) -> pa.Table:  # noqa: B006
        import pyarrow.compute as pc

        vs = _cache.get("vs")
        if vs is None:
            _cache["vs"] = vs = pa.array(ray.get(ids_ref))
        return t.filter(pc.is_in(t.column("doc_id"), value_set=vs))

    old_sigs = (
        ray.data.read_parquet(
            sig_files,
            columns=["doc_id", "sig"],
            override_num_blocks=min(len(sig_files), 8),
        )
        .map_batches(keep_involved, batch_format="pyarrow")
        .rename_columns({"doc_id": "doc_old", "sig": "sig_old"})
    )
    new_sigs = new_core.select_columns(["doc_id", "sig"]).rename_columns(
        {"doc_id": "doc_new", "sig": "sig_new"}
    )

    # same floor-1 sizing as dedup._join_pair_sides: Ray's hash join
    # mishandles partitions with rows on only one side when starved
    n_sig_parts = max(1, min(16, n_cand // 4096))
    joined = cand.join(
        old_sigs, join_type="inner", num_partitions=n_sig_parts, on=("doc_old",)
    ).join(new_sigs, join_type="inner", num_partitions=n_sig_parts, on=("doc_new",))

    def verify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        sa = np.frombuffer(
            b"".join(t.column("sig_old").to_pylist()), dtype=np.uint64
        ).reshape(-1, N_HASHES)
        sb = np.frombuffer(
            b"".join(t.column("sig_new").to_pylist()), dtype=np.uint64
        ).reshape(-1, N_HASHES)
        est = (sa == sb).mean(axis=1)
        keep = pa.array(est >= jaccard_threshold)
        return pa.table(
            {
                "doc_old": t.column("doc_old").filter(keep),
                "doc_new": t.column("doc_new").filter(keep),
                "est_jaccard": pa.array(est[np.asarray(keep)], pa.float64()),
            }
        )

    return joined.map_batches(verify, batch_format="pyarrow")
