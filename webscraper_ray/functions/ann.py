"""Similarity search over an embedding column (task brief §similarity).

- :func:`ann_bruteforce_topk` — exact cosine top-k: broadcast the (small)
  query matrix once via ``ray.put``; each batch computes a numpy matmul
  and emits only its LOCAL top-k rows per query (partial top-k), so the
  final groupby touches ``O(n_batches * k * n_queries)`` tiny rows, never
  the corpus. This is the scalable baseline.
- :func:`ann_lsh_topk` — the scale path: random-hyperplane LSH buckets
  (deterministic planes); queries probe only their own bucket, trading
  recall for touching ~1/2^bits of the corpus. The planes are inlined
  into a generated DuckDB oracle, so even the approximate variant is
  value-hash gated; recall vs brute force is pinned in tests.
- :func:`build_ann_index` / :func:`ann_lsh_topk_indexed` — the storage
  half of the scale path: a one-time write of the corpus partitioned by
  LSH bucket (``bucket=K/`` dirs, mirroring the crawl PageStore layout),
  after which a probe READS only its query buckets' files instead of
  scanning every embedding block. At 1e9+ vectors this turns the probe's
  I/O from corpus-proportional to ~n_query_buckets/2^bits of the corpus.
  On a real cluster the index dir lives on shared storage.
- :func:`embed_cosine_dups` — embedding-cosine near-dup pairs: bucket by
  the same hyperplane family, pairwise cosine INSIDE buckets only.

Float discipline: similarities are computed in float64 and rounded to 6
decimals so the DuckDB oracle (list_cosine_similarity) hashes equal.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

__all__ = [
    "ann_bruteforce_topk",
    "ann_filtered_topk",
    "ann_lsh_topk",
    "build_ann_index",
    "ann_lsh_topk_indexed",
    "ann_ivf_topk",
    "embed_cosine_dups",
]


def _norm_rows(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def _embedding_matrix(col: "pa.ChunkedArray | pa.Array") -> np.ndarray:
    """Zero-copy-ish (n, d) float64 matrix from an Arrow list column.

    ``flatten()`` reads the list child values directly (respecting any
    slice offset) instead of materializing one Python list per row the
    way ``to_pylist`` does — the shared decode for every ANN/dedup-embed
    kernel (same pattern as ``clustering._quant_matrix``). Assumes
    fixed-length, null-free embeddings (the corpus contract)."""
    flat = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(flat)
    if n == 0:
        return np.empty((0, 0), dtype=np.float64)
    d = len(flat[0])
    return np.asarray(flat.flatten(), dtype=np.float64).reshape(n, d)


def _id_array(col: "pa.ChunkedArray | pa.Array") -> np.ndarray:
    return np.asarray(col.to_numpy(zero_copy_only=False), dtype=np.int64)


def _topk_rows(scores: np.ndarray, ids: np.ndarray, k: int) -> np.ndarray:
    """Row indices of the k best by (round(score, 6) DESC, id ASC) — the
    SAME ordering contract as the final reduce and the SQL oracle, so a
    block-level partial can never drop a row the oracle keeps on a tie
    at the k-th slot (exact-duplicate embeddings make ties routine).

    O(n) ``argpartition`` selects the boundary value, then only the
    candidate slice (k + boundary ties) is lexsorted — boundary ties
    resolve by id exactly as a full lexsort would."""
    if k >= len(ids):
        return np.arange(len(ids))
    neg = -np.round(scores, 6)
    part = np.argpartition(neg, k - 1)[:k]
    kth_val = neg[part].max()
    cand = np.flatnonzero(neg <= kth_val)
    order = np.lexsort((ids[cand], neg[cand]))[:k]
    return cand[order]


_EMPTY_TOPK = pa.table(
    {
        "query_id": pa.array([], pa.int64()),
        "vec_id": pa.array([], pa.int64()),
        "cos_sim": pa.array([], pa.float64()),
    }
)


def _score_partial_topk(
    ids: np.ndarray,
    mat_normed: np.ndarray,
    q_ids: list[int],
    qn: np.ndarray,
    k: int,
) -> tuple[list[int], list[int], list[float]]:
    """Partial top-k of a normalized batch against normalized queries.

    Output is k rows per query (tiny); the per-row Python loop only runs
    over that output set."""
    sims = mat_normed @ qn.T  # (rows, n_queries)
    kk = min(k, len(ids))
    out_q: list[int] = []
    out_v: list[int] = []
    out_s: list[float] = []
    for qi, qid in enumerate(q_ids):
        col = sims[:, qi]
        top = _topk_rows(col, ids, kk)
        for row in top:
            out_q.append(int(qid))
            out_v.append(int(ids[row]))
            out_s.append(round(float(col[row]), 6))
    return out_q, out_v, out_s


class _BatchTopK:
    """Per-batch partial cosine top-k against the broadcast query matrix."""

    def __init__(self, queries_ref, k: int):
        ref = queries_ref
        self.q_ids, q_mat = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        self.qn = _norm_rows(np.asarray(q_mat, dtype=np.float64))
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = _id_array(batch.column("vec_id"))
        mat = _embedding_matrix(batch.column("embedding"))
        if mat.size == 0:
            return _EMPTY_TOPK
        out_q, out_v, out_s = _score_partial_topk(
            ids, _norm_rows(mat), self.q_ids, self.qn, self.k
        )
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "cos_sim": pa.array(out_s, pa.float64()),
            }
        )


def _final_topk(k: int):
    import pandas as pd

    def reduce_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cos_sim", "vec_id"], ascending=[False, True]).head(k)
        return g

    return reduce_group


def ann_bruteforce_topk(
    ds: "ray.data.Dataset",
    query_ids: list[int],
    query_matrix: np.ndarray,
    k: int = 10,
) -> "ray.data.Dataset":
    """Exact top-k (query_id, vec_id, cos_sim) — the correctness baseline."""
    queries_ref = ray.put((query_ids, query_matrix))
    partial = ds.map_batches(
        _BatchTopK,
        fn_constructor_kwargs={"queries_ref": queries_ref, "k": k},
        batch_format="pyarrow",
        concurrency=2,
    )
    return partial.groupby("query_id").map_groups(_final_topk(k), batch_format="pandas")


class _BatchFilteredTopK:
    """Per-batch partial cosine top-k restricted to candidates whose
    metadata label equals each query's label — the filtered vector
    search every retrieval stack needs (language-restricted neighbors,
    same-class retrieval). Queries grouped by label once in ``__init__``;
    per batch, each label group scores only its boolean-masked row
    slice, so the matmul never touches filtered-out rows and the loop
    runs over distinct QUERY labels (<= n_queries), never rows."""

    def __init__(self, queries_ref, k: int):
        ref = queries_ref
        q_ids, q_mat, q_labels = (
            ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        )
        qn = _norm_rows(np.asarray(q_mat, dtype=np.float64))
        self.by_label: dict[int, tuple[list[int], np.ndarray]] = {}
        for qid, lab, row in zip(q_ids, q_labels, qn):
            ids, rows = self.by_label.setdefault(int(lab), ([], []))
            ids.append(int(qid))
            rows.append(row)
        self.by_label = {
            lab: (ids, np.stack(rows)) for lab, (ids, rows) in self.by_label.items()
        }
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = _id_array(batch.column("vec_id"))
        labels = np.asarray(
            batch.column("label").to_numpy(zero_copy_only=False), dtype=np.int64
        )
        mat = _embedding_matrix(batch.column("embedding"))
        if mat.size == 0:
            return _EMPTY_TOPK
        normed = _norm_rows(mat)
        out_q: list[int] = []
        out_v: list[int] = []
        out_s: list[float] = []
        for lab, (q_ids, qn) in self.by_label.items():
            sel = labels == lab
            if not sel.any():
                continue
            oq, ov, os_ = _score_partial_topk(
                ids[sel], normed[sel], q_ids, qn, self.k
            )
            out_q += oq
            out_v += ov
            out_s += os_
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "cos_sim": pa.array(out_s, pa.float64()),
            }
        )


def ann_filtered_topk(
    ds: "ray.data.Dataset",
    query_ids: list[int],
    query_matrix: np.ndarray,
    query_labels: list[int],
    k: int = 10,
) -> "ray.data.Dataset":
    """Exact metadata-FILTERED top-k: for each query, the k nearest
    by cosine among candidates sharing the query's ``label`` — same
    broadcast + per-batch-partial + one tiny groupby shape as
    :func:`ann_bruteforce_topk`."""
    queries_ref = ray.put((query_ids, query_matrix, query_labels))
    partial = ds.map_batches(
        _BatchFilteredTopK,
        fn_constructor_kwargs={"queries_ref": queries_ref, "k": k},
        batch_format="pyarrow",
        concurrency=2,
    )
    return partial.groupby("query_id").map_groups(_final_topk(k), batch_format="pandas")


def _plane_matrix(dim: int, bits: int, salt: bytes = b"ann-lsh") -> np.ndarray:
    """Deterministic random hyperplanes: blake2b-seeded standard normals."""
    seed = int.from_bytes(hashlib.blake2b(salt, digest_size=8).digest(), "little")
    rng = np.random.default_rng(seed)
    return rng.standard_normal((dim, bits))


def _bucket_of(mat: np.ndarray, planes: np.ndarray) -> np.ndarray:
    signs = (mat @ planes) > 0
    return (signs * (1 << np.arange(planes.shape[1]))).sum(axis=1).astype(np.int64)


def _queries_by_bucket(
    query_ids: list[int], query_matrix: np.ndarray, planes: np.ndarray
) -> dict[int, "ray.ObjectRef"]:
    """Group the query matrix by LSH bucket; one broadcast ref per bucket."""
    q_mat = np.asarray(query_matrix, dtype=np.float64)
    q_buckets = _bucket_of(q_mat, planes)
    by_bucket: dict[int, tuple[list[int], list[np.ndarray]]] = {}
    for qid, qb, qv in zip(query_ids, q_buckets, q_mat):
        by_bucket.setdefault(int(qb), ([], []))[0].append(int(qid))
        by_bucket[int(qb)][1].append(qv)
    return {b: ray.put((ids, np.stack(vecs))) for b, (ids, vecs) in by_bucket.items()}


def ann_lsh_topk(
    ds: "ray.data.Dataset",
    query_ids: list[int],
    query_matrix: np.ndarray,
    k: int = 10,
    bits: int = 4,
) -> "ray.data.Dataset":
    """Approximate top-k: only vectors in a query's LSH bucket are scored.

    Compute is bucket-limited; I/O is not — every input block is still
    read and masked. For the storage-pruned variant build a one-time
    bucket-partitioned index (:func:`build_ann_index`) and probe it with
    :func:`ann_lsh_topk_indexed`; recall measured against the brute-force
    baseline in tests.
    """
    dim = np.asarray(query_matrix).shape[1]
    planes = _plane_matrix(dim, bits)
    refs = _queries_by_bucket(query_ids, query_matrix, planes)
    partial = ds.map_batches(_bucket_scorer(planes, refs, k), batch_format="pyarrow")
    return partial.groupby("query_id").map_groups(_final_topk(k), batch_format="pandas")


def _bucket_scorer(planes: np.ndarray, refs: dict, k: int):
    """Per-batch kernel: bucket each row, score it only against the
    queries of its own bucket (refs: bucket -> broadcast query ref)."""

    def score_bucket(batch: pa.Table) -> pa.Table:
        ids = _id_array(batch.column("vec_id"))
        mat = _embedding_matrix(batch.column("embedding"))
        if mat.size == 0:
            return _EMPTY_TOPK
        buckets = _bucket_of(mat, planes)
        out_q: list[int] = []
        out_v: list[int] = []
        out_s: list[float] = []
        for b, ref in refs.items():
            mask = buckets == b
            if not mask.any():
                continue
            q_ids_b, q_mat_b = ray.get(ref)
            qn = _norm_rows(np.asarray(q_mat_b, dtype=np.float64))
            q, v, s = _score_partial_topk(ids[mask], _norm_rows(mat[mask]), q_ids_b, qn, k)
            out_q.extend(q)
            out_v.extend(v)
            out_s.extend(s)
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "cos_sim": pa.array(out_s, pa.float64()),
            }
        )

    return score_bucket


def build_ann_index(
    ds: "ray.data.Dataset",
    index_dir: str,
    bits: int = 4,
    salt: bytes = b"ann-lsh",
) -> str:
    """One-time bucket-partitioned embedding store (``bucket=K/`` dirs).

    Mirrors the crawl PageStore layout: the LSH bucket IS the storage
    partition, so a probe opens only the files of its query buckets (no
    analog in the reference — task-brief similarity-search op). The write
    streams (map_batches -> partitioned write_parquet); nothing gathers.
    Planes are derived from the embedding dim of the first block.
    """

    def bucketize(batch: pa.Table) -> pa.Table:
        mat = _embedding_matrix(batch.column("embedding"))
        if mat.size == 0:
            buckets = pa.array([], pa.int64())
        else:
            planes = _plane_matrix(mat.shape[1], bits, salt=salt)
            buckets = pa.array(_bucket_of(mat, planes), pa.int64())
        return pa.table(
            {
                "bucket": buckets,
                "vec_id": batch.column("vec_id"),
                "embedding": batch.column("embedding"),
            }
        )

    ds.map_batches(bucketize, batch_format="pyarrow").write_parquet(
        index_dir, partition_cols=["bucket"]
    )
    return index_dir


def ann_lsh_topk_indexed(
    index_dir: str,
    query_ids: list[int],
    query_matrix: np.ndarray,
    k: int = 10,
    bits: int = 4,
    salt: bytes = b"ann-lsh",
) -> "ray.data.Dataset":
    """LSH top-k over a :func:`build_ann_index` store — identical output
    to :func:`ann_lsh_topk` on the same corpus, but the probe READS only
    the ``bucket=K/`` directories its queries hash to (file-level
    pruning), not the whole corpus. ``salt`` (and ``bits``) must match
    the values the index was built with — mismatched planes would probe
    the wrong buckets."""
    dim = np.asarray(query_matrix).shape[1]
    planes = _plane_matrix(dim, bits, salt=salt)
    refs = _queries_by_bucket(query_ids, query_matrix, planes)
    from .textindex import bucket_files

    paths = bucket_files(index_dir, refs.keys())
    empty = pa.table(
        {
            "query_id": pa.array([], pa.int64()),
            "vec_id": pa.array([], pa.int64()),
            "cos_sim": pa.array([], pa.float64()),
        }
    )
    if not paths:
        return ray.data.from_arrow(empty)
    ds = ray.data.read_parquet(paths, columns=["vec_id", "embedding"])
    partial = ds.map_batches(_bucket_scorer(planes, refs, k), batch_format="pyarrow")
    return partial.groupby("query_id").map_groups(_final_topk(k), batch_format="pandas")


HOT_BUCKET_CAP = 4096


def embed_cosine_dups(
    ds: "ray.data.Dataset",
    threshold: float = 0.4,
    bits: int = 2,
    dim: int = 64,
    hot_bucket_cap: int = HOT_BUCKET_CAP,
) -> "ray.data.Dataset":
    """Embedding-cosine near-duplicate pairs (task brief §dedup).

    Scale shape: every vector gets a deterministic hyperplane-LSH bucket
    (salt 'embed-dedup'); the ONLY all-to-all routes (bucket, vec_id,
    embedding) rows; pairwise cosine runs INSIDE buckets as one normalized
    matmul per bucket — never corpus-wide all-pairs. Recall follows the
    standard hyperplane collision bound ((1 - θ/π)^bits per pair); raise
    ``bits`` as the corpus grows (the bucket count is the partition
    count). Buckets over ``hot_bucket_cap`` compare only the star against
    the bucket's min id (m-1 cosines, connectivity-preserving — the same
    giant-duplicate-cluster guard as the minhash bands) instead of the
    m^2/2 matmul. Output: (vec_a, vec_b, cos_sim rounded to 6) with cos
    >= threshold — exactly reproducible by the DuckDB oracle with the
    same inlined planes (oracle corpora stay under the cap).
    """
    planes = _plane_matrix(dim, bits, salt=b"embed-dedup")

    def bucketize(batch: pa.Table) -> pa.Table:
        mat = _embedding_matrix(batch.column("embedding"))
        if mat.size == 0:
            return pa.table(
                {
                    "bucket": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "embedding": batch.column("embedding"),
                }
            )
        return pa.table(
            {
                "bucket": pa.array(_bucket_of(mat, planes), pa.int64()),
                "vec_id": batch.column("vec_id"),
                "embedding": batch.column("embedding"),
            }
        )

    import pandas as pd

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"vec_a": [], "vec_b": [], "cos_sim": []})
        g = g.sort_values("vec_id")
        ids = g["vec_id"].to_numpy()
        mat = _norm_rows(np.stack([np.asarray(v, dtype=np.float64) for v in g["embedding"]]))
        if len(ids) > hot_bucket_cap:
            # Giant-cluster guard: m-1 star cosines against the min id
            # instead of the m^2/2 matmul (see docstring).
            sims = np.round(mat[1:] @ mat[0], 6)
            keep = sims >= threshold
            return pd.DataFrame(
                {
                    "vec_a": np.full(int(keep.sum()), ids[0], dtype=ids.dtype),
                    "vec_b": ids[1:][keep],
                    "cos_sim": sims[keep],
                }
            )
        sims = np.round(mat @ mat.T, 6)
        ii, jj = np.triu_indices(len(ids), k=1)
        keep = sims[ii, jj] >= threshold
        return pd.DataFrame(
            {
                "vec_a": ids[ii[keep]],
                "vec_b": ids[jj[keep]],
                "cos_sim": sims[ii[keep], jj[keep]],
            }
        )

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pairs_in_bucket, batch_format="pandas")
    )


def ann_ivf_topk(
    ds: "ray.data.Dataset",
    query_ids: list[int],
    query_matrix: np.ndarray,
    k: int = 10,
    n_clusters: int = 4,
    iters: int = 2,
    nprobe: int = 2,
) -> "ray.data.Dataset":
    """IVF ANN (task brief's 'IVF variant as the scale path'): k-means
    centroids form the inverted lists; each query probes only its
    ``nprobe`` nearest lists.

    Built on the integer-exact :func:`~webscraper_ray.functions.clustering`
    k-means, so even this two-stage approximate index is value-hash
    gated: the SQL oracle re-runs the same Lloyd iterations, probes the
    same lists (ties: lowest cluster id) and scores the same cosine
    top-k. The corpus pass is ONE map_batches (assign to centroid, score
    only rows whose list is probed by some query, partial top-k); the
    reduce is output-sized.
    """
    from .clustering import QUANT, kmeans_fit, round_half_away

    _, cents = kmeans_fit(ds, k=n_clusters, iters=iters)
    if cents.size == 0:
        # empty corpus: no lists to probe — same contract as the other
        # ANN variants (empty result, not a broadcasting error)
        return ray.data.from_arrow(
            pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "cos_sim": pa.array([], pa.float64()),
                }
            )
        )
    qmat = np.asarray(query_matrix, dtype=np.float64)
    qq = round_half_away(qmat * QUANT).astype(np.int64)
    qdiff = qq[:, None, :] - cents[None, :, :]
    qdist = (qdiff * qdiff).sum(axis=2)  # (n_queries, k_clusters)
    # nprobe nearest lists per query; stable argsort ties to lowest cl,
    # matching the oracle's ORDER BY dist, cl
    probe_lists = np.argsort(qdist, axis=1, kind="stable")[:, :nprobe]
    # cluster -> (query row indices probing it)
    by_cluster: dict[int, list[int]] = {}
    for qi in range(len(query_ids)):
        for c in probe_lists[qi]:
            by_cluster.setdefault(int(c), []).append(qi)
    qn = _norm_rows(qmat)
    shipped = ray.put((cents, by_cluster, list(query_ids), qn))

    def score(batch: pa.Table) -> pa.Table:
        c_ref, probes, qids, qnorm = ray.get(shipped)
        ids = _id_array(batch.column("vec_id"))
        mat = _embedding_matrix(batch.column("embedding"))
        out_q, out_v, out_s = [], [], []
        if mat.size:
            xq = round_half_away(mat * QUANT).astype(np.int64)
            diff = xq[:, None, :] - c_ref[None, :, :]
            assign = np.argmin((diff * diff).sum(axis=2), axis=1)
            xn = _norm_rows(mat)
            for c, q_rows in probes.items():
                mask = assign == c
                if not mask.any():
                    continue
                sims = xn[mask] @ qnorm[q_rows].T  # (members, probing queries)
                member_ids = ids[mask]
                for col, qi in enumerate(q_rows):
                    s = sims[:, col]
                    top = _topk_rows(s, member_ids, k)
                    for row in top:
                        out_q.append(int(qids[qi]))
                        out_v.append(int(member_ids[row]))
                        out_s.append(round(float(s[row]), 6))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "cos_sim": pa.array(out_s, pa.float64()),
            }
        )

    partial = ds.map_batches(score, batch_format="pyarrow")
    return partial.groupby("query_id").map_groups(_final_topk(k), batch_format="pandas")


def _queries_by_bucket_multiprobe(
    query_ids: list[int], query_matrix: np.ndarray, planes: np.ndarray
) -> dict[int, "ray.ObjectRef"]:
    """Multi-probe registration: each query lands in its OWN bucket plus
    every Hamming-distance-1 neighbor (one hyperplane sign flipped) —
    the classic recall fix for sign-LSH (Lv et al., VLDB'07: near
    neighbors concentrate in buckets differing by the planes the point
    sits closest to). bits+1 probe buckets per query; a vector still
    lives in exactly ONE bucket, so no (query, vector) pair is scored
    twice and the per-bucket scorer is reused unchanged."""
    q_mat = np.asarray(query_matrix, dtype=np.float64)
    bits = planes.shape[1]
    q_buckets = _bucket_of(q_mat, planes)
    by_bucket: dict[int, tuple[list[int], list[np.ndarray]]] = {}
    for qid, qb, qv in zip(query_ids, q_buckets, q_mat):
        probe = {int(qb)} | {int(qb) ^ (1 << i) for i in range(bits)}
        for b in probe:
            by_bucket.setdefault(b, ([], []))[0].append(int(qid))
            by_bucket[b][1].append(qv)
    return {b: ray.put((ids, np.stack(vecs))) for b, (ids, vecs) in by_bucket.items()}


def ann_lsh_topk_multiprobe(
    index_dir: str,
    query_ids: list[int],
    query_matrix: np.ndarray,
    k: int = 10,
    bits: int = 4,
    salt: bytes = b"ann-lsh",
) -> "ray.data.Dataset":
    """Multi-probe LSH top-k over a :func:`build_ann_index` store: reads
    the (bits+1) probe-bucket dirs per query instead of one — still
    file-pruned (never a corpus scan for bits > ~2), with recall strictly
    >= the single-probe :func:`ann_lsh_topk_indexed` on the same index
    (the probe set is a superset). Deterministic planes keep it exactly
    SQL-gateable."""
    dim = np.asarray(query_matrix).shape[1]
    planes = _plane_matrix(dim, bits, salt=salt)
    refs = _queries_by_bucket_multiprobe(query_ids, query_matrix, planes)
    from .textindex import bucket_files

    paths = bucket_files(index_dir, refs.keys())
    if not paths:
        return ray.data.from_arrow(_EMPTY_TOPK)
    ds = ray.data.read_parquet(paths, columns=["vec_id", "embedding"])
    partial = ds.map_batches(_bucket_scorer(planes, refs, k), batch_format="pyarrow")
    return partial.groupby("query_id").map_groups(_final_topk(k), batch_format="pandas")


MAX_BITEXT_BROADCAST = 2_000_000


def bitext_mutual_pairs(
    ds: "ray.data.Dataset",
    src_label: int = 0,
    tgt_label: int = 1,
    max_src_broadcast: int = MAX_BITEXT_BROADCAST,
) -> "ray.data.Dataset":
    """Margin-based bitext mining (Artetxe & Schwenk, ACL'19): mutual
    cosine top-1 pairs between the ``src_label`` and ``tgt_label``
    shards of an embedding corpus, with the DISTANCE margin
    ``cos1 - cos2`` (best minus runner-up — the paper's 'margin(x,y) =
    cos - second best' variant, chosen over the ratio form because a
    difference of two already-rounded floats replays bit-identically in
    the SQL gate, while an averaged-top-k denominator would hinge on
    float summation order).

    Scale shape — the broadcast-queries discipline of the ANN family:
    the SOURCE shard (the smaller language, the standard mining setup)
    gathers once behind a LOUD bound and broadcasts via ``ray.put``;
    the TARGET shard streams. Forward: per-batch partial top-2 per src
    (2 rows per src per batch) -> one src-keyed exchange for the exact
    global top-2 (ties by id, the `_topk_rows` contract). Backward:
    each tgt batch scores the COMPLETE broadcast src matrix, so its
    top-2 is final with no exchange. The mutuality join is one
    composite-keyed groupby of two OUTPUT-sized row sets.
    """
    import pandas as pd

    src_ids: list[int] = []
    src_rows: list[np.ndarray] = []
    src_ds = ds.map_batches(
        lambda t: t.filter(pc.equal(t.column("label"), src_label)).select(
            ["vec_id", "embedding"]
        ),
        batch_format="pyarrow",
    )
    for b in src_ds.iter_batches(batch_format="pyarrow"):
        src_ids.extend(b.column("vec_id").to_pylist())
        m = _embedding_matrix(b.column("embedding"))
        if m.size:
            src_rows.append(m)
        if len(src_ids) > max_src_broadcast:
            raise ValueError(
                f"bitext_mutual_pairs: source shard exceeds the broadcast "
                f"bound {max_src_broadcast}; mine from the smaller side or "
                "raise the bound deliberately."
            )
    if not src_ids:
        return ray.data.from_arrow(
            pa.table(
                {
                    "src_id": pa.array([], pa.int64()),
                    "tgt_id": pa.array([], pa.int64()),
                    "cos_sim": pa.array([], pa.float64()),
                    "margin": pa.array([], pa.float64()),
                }
            )
        )
    src_id_arr = np.asarray(src_ids, dtype=np.int64)
    src_mat = _norm_rows(np.concatenate(src_rows))
    shipped = ray.put((src_id_arr, src_mat))

    def score_tgt(batch: pa.Table) -> pa.Table:
        sid, smat = ray.get(shipped)
        t = batch.filter(pc.equal(batch.column("label"), tgt_label))
        ids = _id_array(t.column("vec_id"))
        mat = _embedding_matrix(t.column("embedding"))
        rows = {
            "side": [], "a": [], "b": [], "cos": [], "rank": []
        }
        if mat.size:
            sims = _norm_rows(mat) @ smat.T  # (tgt_batch, n_src)
            # backward: exact top-2 per tgt row over the COMPLETE src side
            for r in range(sims.shape[0]):
                top = _topk_rows(sims[r], sid, 2)
                for rk, s_row in enumerate(top):
                    rows["side"].append(1)
                    rows["a"].append(int(sid[s_row]))   # src
                    rows["b"].append(int(ids[r]))       # tgt
                    rows["cos"].append(round(float(sims[r, s_row]), 6))
                    rows["rank"].append(rk + 1)
            # forward partials: top-2 per src over THIS tgt batch
            for c in range(sims.shape[1]):
                top = _topk_rows(sims[:, c], ids, 2)
                for rk, t_row in enumerate(top):
                    rows["side"].append(0)
                    rows["a"].append(int(sid[c]))
                    rows["b"].append(int(ids[t_row]))
                    rows["cos"].append(round(float(sims[t_row, c]), 6))
                    rows["rank"].append(rk + 1)
        return pa.table(
            {
                "side": pa.array(rows["side"], pa.int8()),
                "a": pa.array(rows["a"], pa.int64()),
                "b": pa.array(rows["b"], pa.int64()),
                "cos": pa.array(rows["cos"], pa.float64()),
                "rank": pa.array(rows["rank"], pa.int64()),
            }
        )

    def top2_of(g: pd.DataFrame, val_col: str, id_col: str):
        g = g.sort_values([val_col, id_col], ascending=[False, True])
        best = g.iloc[0]
        second = float(g.iloc[1][val_col]) if len(g) > 1 else -1.0
        return best, second

    def fwd_reduce(g: pd.DataFrame) -> pd.DataFrame:
        best, second = top2_of(g, "cos", "b")
        return pd.DataFrame(
            {
                "side": [0],
                "a": [int(best["a"])],
                "b": [int(best["b"])],
                "cos": [float(best["cos"])],
                "margin": [round(float(best["cos"]) - second, 6)],
            }
        )

    def bwd_reduce(g: pd.DataFrame) -> pd.DataFrame:
        best, _second = top2_of(g, "cos", "a")
        return pd.DataFrame(
            {
                "side": [1],
                "a": [int(best["a"])],
                "b": [int(best["b"])],
                "cos": [float(best["cos"])],
                "margin": [0.0],
            }
        )

    scored = ds.map_batches(score_tgt, batch_format="pyarrow").materialize()
    fwd = (
        scored.filter(expr="side == 0")
        .groupby("a")
        .map_groups(fwd_reduce, batch_format="pandas")
    )
    bwd = (
        scored.filter(expr="side == 1")
        .groupby("b")
        .map_groups(bwd_reduce, batch_format="pandas")
    )

    def mutual(g: pd.DataFrame) -> pd.DataFrame:
        f = g[g["side"] == 0]
        w = g[g["side"] == 1]
        if len(f) == 1 and len(w) == 1:
            r = f.iloc[0]
            return pd.DataFrame(
                {
                    "src_id": [int(r["a"])],
                    "tgt_id": [int(r["b"])],
                    "cos_sim": [float(r["cos"])],
                    "margin": [float(r["margin"])],
                }
            )
        return pd.DataFrame(
            {"src_id": [], "tgt_id": [], "cos_sim": [], "margin": []}
        )

    return fwd.union(bwd).groupby(["a", "b"]).map_groups(
        mutual, batch_format="pandas"
    )


def merge_ann_index(
    ds: "ray.data.Dataset",
    index_dir: str,
    bits: int = 4,
    salt: bytes = b"ann-lsh",
) -> str:
    """Incremental index maintenance: merge a DELTA corpus into an
    existing :func:`build_ann_index` store WITHOUT rebuilding it.

    The bucket-partitioned layout makes this a pure append, so the
    implementation IS :func:`build_ann_index` (one bucketize kernel —
    base and delta can never bucket differently): delta rows hash under
    the same deterministic planes and stream into NEW uniquely-named
    parquet files inside their ``bucket=K/`` dirs; existing files are
    never touched, a crashed merge leaves the old files intact, and
    probes list a bucket dir's files and see base + every merged delta
    with no coordination. Merge cost is delta-proportional, never
    corpus-proportional."""
    return build_ann_index(ds, index_dir, bits=bits, salt=salt)


KNN_NOISE_BUCKET_CAP = 65536


def knn_label_noise(
    ds: "ray.data.Dataset",
    bits: int = 3,
    k: int = 3,
    dim: int = 64,
    hot_bucket_cap: int = KNN_NOISE_BUCKET_CAP,
) -> "ray.data.Dataset":
    """Label-noise detection by neighbor disagreement (the
    Confident-Learning-style data-cleaning sweep): every vector whose
    LSH-bucket k-NN majority label differs from its own label is
    flagged — the standard pre-training triage for mislabeled examples.

    Scale shape = :func:`embed_cosine_dups`: deterministic hyperplane
    buckets (salt ``label-noise``) are the ONLY all-to-all key; the
    k-NN + vote runs INSIDE buckets, never corpus-wide, with the
    bucket matmul CHUNKED (1024 query rows at a time) so peak memory
    is m*1024 doubles however large the bucket — compute within a
    bucket is still O(m^2), so ``bits`` must scale with the corpus
    (buckets ~ corpus/2^bits); past ``hot_bucket_cap`` the operator
    refuses loudly rather than burning quadratic time on a
    mis-configured bucket count. Vote ties break (count DESC, label
    ASC); neighbor
    ties break (cos DESC, id ASC) — the `_topk_rows` contract, so the
    inlined-plane SQL oracle replays every flagged row exactly.
    Output: (vec_id, own_label, peer_label, n_votes) for mismatches.
    """
    import pandas as pd

    planes = _plane_matrix(dim, bits, salt=b"label-noise")

    def bucketize(batch: pa.Table) -> pa.Table:
        mat = _embedding_matrix(batch.column("embedding"))
        if mat.size == 0:
            buckets = pa.array([], pa.int64())
        else:
            buckets = pa.array(_bucket_of(mat, planes), pa.int64())
        return pa.table(
            {
                "bucket": buckets,
                "vec_id": batch.column("vec_id"),
                "label": pc.cast(batch.column("label"), pa.int64()),
                "embedding": batch.column("embedding"),
            }
        )

    empty = pd.DataFrame(
        {"vec_id": [], "own_label": [], "peer_label": [], "n_votes": []}
    )

    def flag_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        m = len(g)
        if m < 2:
            return empty
        if m > hot_bucket_cap:
            raise ValueError(
                f"knn_label_noise: bucket of {m} vectors exceeds "
                f"{hot_bucket_cap}; raise bits (more buckets) or the cap."
            )
        g = g.sort_values("vec_id")
        ids = g["vec_id"].to_numpy(dtype=np.int64)
        labels = g["label"].to_numpy(dtype=np.int64)
        mat = _norm_rows(
            np.stack([np.asarray(v, dtype=np.float64) for v in g["embedding"]])
        )
        out = {"vec_id": [], "own_label": [], "peer_label": [], "n_votes": []}
        CHUNK = 1024  # memory bound: m x CHUNK doubles, never m x m
        for c0 in range(0, m, CHUNK):
            sims = np.round(mat[c0 : c0 + CHUNK] @ mat.T, 6)
            for rr in range(sims.shape[0]):
                r = c0 + rr
                s = sims[rr].copy()
                s[r] = -np.inf  # exclude self
                peer_rows = _topk_rows(s, ids, min(k, m - 1))
                peer_labels = labels[peer_rows]
                uniq, counts = np.unique(peer_labels, return_counts=True)
                order = np.lexsort((uniq, -counts))
                winner, votes = int(uniq[order[0]]), int(counts[order[0]])
                if winner != int(labels[r]):
                    out["vec_id"].append(int(ids[r]))
                    out["own_label"].append(int(labels[r]))
                    out["peer_label"].append(winner)
                    out["n_votes"].append(votes)
        return pd.DataFrame(out)

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(flag_in_bucket, batch_format="pandas")
    )
