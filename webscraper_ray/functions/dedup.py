"""Deduplication operators over a document table (task brief §dedup).

All operators stream via ``map_batches`` and shuffle only SMALL derived
rows (hashes / band keys), never the document text or the full minhash
signature — the pattern that holds at 100 TB:

- exact:   md5(text) per batch -> groupby(hash) -> (first doc_id, count)
- minhash: distinct 3-token shingles -> 64 xor-permutation minima ->
           16 bands; ONLY (band_id, band_hash, doc_id) rows shuffle
           (~24 B/row vs the 512-B signature); candidate pairs come from
           a groupby on the band key (hot buckets emit a connectivity-
           preserving star, bounding giant clusters), and the signature
           agreement verify is a distributed join of the OUTPUT-sized
           pair set against the involved docs' signatures — no pair set
           is ever gathered to the driver.
- simhash: 64-bit sign-sketch of token hashes; groups = equal sketches.
- ngram-jaccard: exact k-shingle verifier, only ever applied INSIDE
           candidate sets (LSH output), never across the corpus.

Hash family (deliberately SQL-reproducible so the driver's DuckDB gate
can verify every sketch end-to-end):

- base hash  ``h(s) = big-endian first 8 bytes of md5(s)``
             == DuckDB ``('0x' || substr(md5(s),1,16))::UBIGINT``
- minhash permutation i: ``min over shingles of h(s) XOR C_i`` with
  ``C_i = h('minhash:i')`` — xor-family min-hashing (weaker independence
  than multiply-shift, adequate for near-dup banding, and expressible
  with DuckDB ``xor``; 64-bit multiply mod 2^64 overflows DuckDB's
  checked integer arithmetic).
- band hash: first 16 hex chars of md5 over the band's 4 sig values
  formatted as 16-hex-char strings.

Tokens are ASCII word runs ``[a-z0-9_]+`` of the lowercased text (the
SQL contract ``string_split_regex(lower(text), '[^a-z0-9_]+')``); the
driver corpora are ASCII. Docs with fewer than 3 tokens have no shingles
and never enter minhash pairing.

Per-batch kernels are vectorized: one C-level md5 pass over the batch's
distinct shingles, then numpy (xor-broadcast + ``minimum.reduceat``) for
all 64 permutations of all docs at once — no per-row Python loops over
hash lattices (the round-1 kernel paid per-shingle blake2b + per-doc
banding loops: ~77 docs/s; this one measures thousands/s).

Determinism: md5 only, no RNG state.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa

import ray.data

__all__ = [
    "add_md5",
    "exact_dedup",
    "md5_u64",
    "minhash_signature",
    "minhash_signatures_batch",
    "minhash_near_dups",
    "simhash64",
    "simhash_dups",
    "ngram_jaccard",
    "ngram_near_dups",
    "N_HASHES",
    "N_BANDS",
]

_TOKEN = re.compile(r"[a-z0-9_]+")

N_HASHES = 64
N_BANDS = 16
_ROWS_PER_BAND = N_HASHES // N_BANDS


def md5_u64(s: str) -> int:
    """First 8 md5 bytes, big-endian — equals DuckDB
    ``('0x'||substr(md5(s),1,16))::UBIGINT``."""
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "big")


def _md5_hex(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def add_md5(batch: pa.Table, text_col: str = "text") -> pa.Table:
    hashes = [_md5_hex(t or "") for t in batch.column(text_col).to_pylist()]
    return batch.append_column("text_md5", pa.array(hashes, pa.string()))


def exact_dedup(ds: "ray.data.Dataset", id_col: str = "doc_id") -> "ray.data.Dataset":
    """(text_md5, doc_id=min id, n_copies). The only shuffled payload is the
    32-char hash + id — pre-aggregated per batch before the groupby."""

    def partial(batch: pa.Table) -> pa.Table:
        batch = add_md5(batch)
        grouped = batch.group_by("text_md5").aggregate(
            [(id_col, "min"), (id_col, "count")]
        )
        return grouped.rename_columns(["text_md5", "min_id", "cnt"])

    from ray.data.aggregate import Min, Sum

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return (
        partials.groupby("text_md5")
        .aggregate(Min("min_id", alias_name="doc_id"), Sum("cnt", alias_name="n_copies"))
    )


# --- MinHash-LSH ------------------------------------------------------------

# xor-permutation constants C_i = h("minhash:i") — derivable in SQL
_XOR_C = np.array([md5_u64(f"minhash:{i}") for i in range(N_HASHES)], dtype=np.uint64)


def _tokens(text: str) -> list[str]:
    return _TOKEN.findall(text.lower())


def _shingles(text: str, k: int = 3) -> set[str]:
    """Distinct k-token shingles; < k tokens -> no shingles (the SQL
    contract: shingle i exists only for i+k-1 <= n_tokens)."""
    toks = _tokens(text)
    if len(toks) < k:
        return set()
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def minhash_signatures_batch(texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized signatures for a batch.

    Returns ``(sigs, has_sig)``: sigs is (n_docs, N_HASHES) uint64 —
    docs without shingles get all-max sentinel rows and has_sig False.
    One md5 pass over the batch's shingles; permutations + per-doc minima
    are a single xor-broadcast + ``np.minimum.reduceat``.
    """
    n = len(texts)
    sigs = np.full((n, N_HASHES), np.iinfo(np.uint64).max, dtype=np.uint64)
    has_sig = np.zeros(n, dtype=bool)
    flat: list[int] = []
    offsets: list[int] = []
    doc_idx: list[int] = []
    for i, t in enumerate(texts):
        sh = _shingles(t or "")
        if not sh:
            continue
        offsets.append(len(flat))
        doc_idx.append(i)
        flat.extend(md5_u64(s) for s in sh)
        has_sig[i] = True
    if not doc_idx:
        return sigs, has_sig
    h = np.array(flat, dtype=np.uint64)
    grid = h[:, None] ^ _XOR_C[None, :]  # (total_shingles, 64)
    mins = np.minimum.reduceat(grid, np.array(offsets, dtype=np.int64), axis=0)
    sigs[np.array(doc_idx, dtype=np.int64)] = mins
    return sigs, has_sig


def minhash_signature(text: str, n_hashes: int = N_HASHES, k: int = 3) -> np.ndarray:
    """Single-doc convenience wrapper over the batch kernel."""
    sigs, _ = minhash_signatures_batch([text])
    return sigs[0, :n_hashes]


def _band_hashes(sig_row: np.ndarray) -> list[str]:
    """16-hex band keys: md5 over the band's sig values as hex16 strings
    (SQL: substr(md5(concat of lpad(lower(hex(s_i)),16,'0')),1,16))."""
    out = []
    for b in range(N_BANDS):
        chunk = sig_row[b * _ROWS_PER_BAND : (b + 1) * _ROWS_PER_BAND]
        s = "".join(f"{int(v):016x}" for v in chunk)
        out.append(_md5_hex(s)[:16])
    return out


def _band_hashes_u64(sig_row: np.ndarray) -> list[int]:
    """Same band keys as :func:`_band_hashes`, as uint64 (the first 8 md5
    bytes big-endian == int(hex16, 16)) — the SHUFFLE representation; the
    final pair output, and therefore the SQL oracle, is unchanged."""
    out = []
    for b in range(N_BANDS):
        chunk = sig_row[b * _ROWS_PER_BAND : (b + 1) * _ROWS_PER_BAND]
        s = "".join(f"{int(v):016x}" for v in chunk)
        out.append(int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big"))
    return out



HOT_BAND_CAP = 256


_BAND_PARTS = 64

_KN1 = np.uint64(0x9E3779B97F4A7C15)
_KN2 = np.uint64(0xC2B2AE3D27D4EB4F)


def xor_mix_parts(cols: list[np.ndarray], num_parts: int) -> np.ndarray:
    """Partition ids (int32) from the xor-mix of integer key columns —
    THE multi-column hash-partition family (`_hash_distinct`, the pair
    rollups): change it here and every consumer moves together."""
    h = np.zeros(len(cols[0]), dtype=np.uint64)
    for j, v in enumerate(cols):
        h ^= (v.astype(np.uint64) + np.uint64(j + 1)) * (
            _KN1 if j % 2 == 0 else _KN2
        )
    return (h % np.uint64(num_parts)).astype(np.int32)


def _hash_distinct(
    ds: "ray.data.Dataset", cols: list[str], num_parts: int = _BAND_PARTS
) -> "ray.data.Dataset":
    """DISTINCT over int64 ``cols``: one hash-partition shuffle + a
    vectorized per-partition ``np.unique``.

    Replaces ``groupby(cols).count()`` where only the distinct rows are
    wanted — Ray's sort-based Aggregate paid 33.7 s for the sf1 pair
    dedupe that this shape does in under a second (measured, BASELINE
    §c sf1); the output row set is identical.
    """

    def add_p(t: pa.Table) -> pa.Table:
        parts = xor_mix_parts(
            [t.column(c).to_numpy(zero_copy_only=False) for c in cols],
            num_parts,
        )
        return t.append_column("_dp", pa.array(parts))

    def uniq(t: pa.Table) -> pa.Table:
        # lexsort + neighbor-diff, not np.unique(axis=0): the void-dtype
        # structured sort behind axis=0 measured ~10x slower on the 100x
        # stress corpus's multi-hundred-million-row pair streams
        arrs = [
            t.column(c).to_numpy(zero_copy_only=False).astype(np.int64)
            for c in cols
        ]
        if not arrs or arrs[0].size == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        order = np.lexsort(arrs[::-1])
        arrs = [a[order] for a in arrs]
        keep = np.zeros(arrs[0].size, dtype=bool)
        keep[0] = True
        for a in arrs:
            keep[1:] |= a[1:] != a[:-1]
        return pa.table(
            {c: pa.array(a[keep], pa.int64()) for c, a in zip(cols, arrs)}
        )

    return (
        ds.map_batches(add_p, batch_format="pyarrow")
        .groupby("_dp")
        .map_groups(uniq, batch_format="pyarrow")
    )


def _band_candidates(
    ds: "ray.data.Dataset",
    id_col: str,
    text_col: str,
    hot_band_cap: int = HOT_BAND_CAP,
    num_parts: int = _BAND_PARTS,
) -> "tuple":
    """Shared LSH candidate stage: band rows -> ONE hash-partition
    shuffle on the band key -> vectorized multi-bucket pair emission per
    partition -> distinct (doc_a < doc_b) pairs as a MATERIALIZED
    output-sized Dataset (the pair set never reaches the driver). Band
    rows (~20 B: int32 band + uint64 key + id) are the sole
    corpus-proportional shuffle payload.

    Partition-wise emission (not per-bucket ``map_groups``): grouping by
    the raw band key dispatches one Python call per bucket — at 10x bench
    scale that was 800k dispatches and 65 of 90 s (measured, BASELINE §c
    sf1). Instead band rows hash-partition into ``num_parts`` groups and
    each partition lexsorts once; the only per-bucket Python loop runs
    over buckets with >= 2 members, which is duplicate-proportional.
    Bucket identity is the exact (band_id, band key) pair, so the pair
    set — and the SQL oracle — is unchanged.

    Hot-band guard: a giant duplicate cluster puts m docs under ONE band
    key; all-pairs there is O(m^2) rows. Buckets over ``hot_band_cap``
    emit a STAR to the bucket's min doc id (m-1 pairs) instead —
    connectivity-preserving for duplicate clustering, bounded output.
    Buckets at or under the cap are exhaustive, so corpora without giant
    clusters (the oracle gate's corpora) are byte-identical to the
    all-pairs contract.
    """

    def band_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        sigs, has_sig = minhash_signatures_batch(texts)
        out_band, out_hash, out_id = [], [], []
        for i, (doc, ok) in enumerate(zip(ids, has_sig)):
            if not ok:
                continue
            for b, bh in enumerate(_band_hashes_u64(sigs[i])):
                out_band.append(b)
                out_hash.append(bh)
                out_id.append(doc)
        bu = np.array(out_hash, dtype=np.uint64)
        return pa.table(
            {
                "_part": pa.array((bu % num_parts).astype(np.int32)),
                "band_id": pa.array(out_band, pa.int32()),
                "band_u64": pa.array(bu),
                id_col: pa.array(out_id),
            }
        )

    bands = ds.map_batches(band_rows, batch_format="pyarrow")
    return _pairs_from_bands(bands, id_col, hot_band_cap, num_parts)


def _pairs_from_bands(
    bands: "ray.data.Dataset",
    id_col: str,
    hot_band_cap: int = HOT_BAND_CAP,
    num_parts: int = _BAND_PARTS,
) -> "tuple":
    """Pair emission half of :func:`_band_candidates`: a band-row Dataset
    (``_part``, ``band_id``, ``band_u64``, id) -> distinct (a < b)
    candidate pairs, materialized. Shared by the text path
    (:func:`_band_candidates`) and the precomputed-signature path
    (:func:`_band_candidates_from_sigs`) so both emit byte-identical
    pair sets."""
    a_col, b_col = f"{id_col}_a", f"{id_col}_b"
    empty = pa.table(
        {a_col: pa.array([], pa.int64()), b_col: pa.array([], pa.int64())}
    )

    def emit_pairs(part: pa.Table) -> pa.Table:
        if part.num_rows < 2:
            return empty
        bid = part.column("band_id").to_numpy(zero_copy_only=False)
        bu = part.column("band_u64").to_numpy(zero_copy_only=False)
        ids = np.asarray(
            part.column(id_col).to_numpy(zero_copy_only=False), dtype=np.int64
        )
        order = np.lexsort((ids, bu, bid))
        bid, bu, ids = bid[order], bu[order], ids[order]
        change = np.flatnonzero((bid[1:] != bid[:-1]) | (bu[1:] != bu[:-1])) + 1
        starts = np.concatenate([[0], change])
        ends = np.concatenate([change, [len(ids)]])
        multi = ends - starts >= 2
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        for s, e in zip(starts[multi], ends[multi]):
            g = ids[s:e]
            m = int(e - s)
            if m <= hot_band_cap:
                ii, jj = np.triu_indices(m, k=1)
                out_a.append(g[ii])
                out_b.append(g[jj])
            else:  # hot band: star to the min id, m-1 pairs vs m^2/2
                out_a.append(np.full(m - 1, g[0]))
                out_b.append(g[1:])
        if not out_a:
            return empty
        # partition-local distinct shrinks the final dedupe shuffle (a
        # duplicate cluster collides in all 16 bands -> 16x repeat here);
        # lexsort + neighbor-diff, not np.unique(axis=0) — the void-dtype
        # sort behind axis=0 is ~10x slower at stress-corpus volumes
        ua, ub = np.concatenate(out_a), np.concatenate(out_b)
        order = np.lexsort((ub, ua))
        ua, ub = ua[order], ub[order]
        keep = np.r_[True, (ua[1:] != ua[:-1]) | (ub[1:] != ub[:-1])]
        return pa.table(
            {
                a_col: pa.array(ua[keep], pa.int64()),
                b_col: pa.array(ub[keep], pa.int64()),
            }
        )

    pairs = _hash_distinct(
        bands.groupby("_part").map_groups(emit_pairs, batch_format="pyarrow"),
        [a_col, b_col],
        num_parts,
    ).materialize()  # output-sized; reused by the verify joins
    return pairs, a_col, b_col


def _band_candidates_from_sigs(
    sig_ds: "ray.data.Dataset",
    id_col: str,
    hot_band_cap: int = HOT_BAND_CAP,
    num_parts: int = _BAND_PARTS,
) -> "tuple":
    """:func:`_band_candidates` fed from a precomputed signature table
    (columns ``id_col``, ``sig`` binary — null for shingle-less docs)
    instead of raw text. Band keys are re-derived from the stored
    signature bytes exactly as the text path derives them from the fresh
    signature, so the candidate pair set is byte-identical; the corpus
    text is not re-read or re-tokenized."""

    def band_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        sigs = batch.column("sig").to_pylist()
        out_band, out_hash, out_id = [], [], []
        for doc, sig in zip(ids, sigs):
            if sig is None:
                continue
            row = np.frombuffer(sig, dtype=np.uint64)
            for b, bh in enumerate(_band_hashes_u64(row)):
                out_band.append(b)
                out_hash.append(bh)
                out_id.append(doc)
        bu = np.array(out_hash, dtype=np.uint64)
        return pa.table(
            {
                "_part": pa.array((bu % num_parts).astype(np.int32)),
                "band_id": pa.array(out_band, pa.int32()),
                "band_u64": pa.array(bu),
                id_col: pa.array(out_id, pa.int64()),
            }
        )

    bands = sig_ds.select_columns([id_col, "sig"]).map_batches(
        band_rows, batch_format="pyarrow"
    )
    return _pairs_from_bands(bands, id_col, hot_band_cap, num_parts)


# Involved-id broadcast bound: above this many distinct candidate-pair doc
# ids (~32 MB of int64) the id list stops being "output-sized" in any useful
# sense — a high-duplication corpus drives it toward corpus-sized — and the
# involved-doc filter switches from a ray.put broadcast to a distributed
# hash semi-join, so nothing corpus-proportional is ever gathered driver-side.
INVOLVED_BROADCAST_MAX = 4_000_000


def _involved_ids_ds(
    pairs: "ray.data.Dataset", a_col: str, b_col: str
) -> "ray.data.Dataset":
    """Distinct doc ids appearing in any candidate pair, as an
    output-sized MATERIALIZED Dataset (column ``doc_id``) — the pair set
    and the id set both stay distributed."""

    def both(t: pa.Table) -> pa.Table:
        merged = pa.concat_arrays(
            [
                t.column(a_col).cast(pa.int64()).combine_chunks(),
                t.column(b_col).cast(pa.int64()).combine_chunks(),
            ]
        )
        return pa.table({"doc_id": merged})

    return _hash_distinct(
        pairs.map_batches(both, batch_format="pyarrow"), ["doc_id"]
    ).materialize()


def _involved_ids_ref(inv_ds: "ray.data.Dataset"):
    """Broadcast ref of the involved-id list — only called when the count
    is under :data:`INVOLVED_BROADCAST_MAX` (see :func:`_involved_docs`)."""
    import ray

    ids = inv_ds.take_all()
    involved = np.array(sorted(r["doc_id"] for r in ids), dtype=np.int64)
    return ray.put(involved)


def _involved_docs(
    ds: "ray.data.Dataset",
    pairs: "ray.data.Dataset",
    id_col: str,
    text_col: str,
    a_col: str,
    b_col: str,
    broadcast_max: int = INVOLVED_BROADCAST_MAX,
) -> "ray.data.Dataset":
    """``(id_col, text_col)`` rows of the docs that appear in a candidate
    pair — the shared input of the signature/shingle verify recompute.

    Two plans, picked by the DISTINCT involved-id count:

    - ``<= broadcast_max``: ray.put the id array once, map-side ``is_in``
      filter — no shuffle of the corpus (the cheap path on ordinary
      duplication rates).
    - above it: a distributed hash semi-join of the corpus against the
      id Dataset (same machinery as :func:`_join_pair_sides`). The corpus
      text ships through ONE hash exchange — unavoidable, since on such a
      corpus the verify must recompute signatures for ~every doc anyway —
      and the driver never holds the id list.
    """
    return _involved_rows(ds, pairs, id_col, [text_col], a_col, b_col, broadcast_max)


def _involved_rows(
    ds: "ray.data.Dataset",
    pairs: "ray.data.Dataset",
    id_col: str,
    cols: list[str],
    a_col: str,
    b_col: str,
    broadcast_max: int = INVOLVED_BROADCAST_MAX,
) -> "ray.data.Dataset":
    """Generalized :func:`_involved_docs`: filter ``ds`` (any per-doc
    payload table — raw text, or a precomputed signature/shingle store)
    to the rows whose ``id_col`` appears in a candidate pair. Same two
    plans: broadcast ``is_in`` under ``broadcast_max`` distinct ids,
    distributed hash semi-join above it."""
    import pyarrow.compute as pc

    inv_ds = _involved_ids_ds(pairs, a_col, b_col)
    n_inv = inv_ds.count()
    docs = ds.select_columns([id_col, *cols])
    if n_inv <= broadcast_max:
        ref = _involved_ids_ref(inv_ds)

        def keep(batch: pa.Table, _ref=ref, _cache={}) -> pa.Table:  # noqa: B006
            vs = _cache.get("vs")
            if vs is None:  # one get + Arrow conversion per worker, not per batch
                import ray as _ray

                vs = pa.array(_ray.get(_ref))
                _cache["vs"] = vs
            return batch.filter(pc.is_in(batch.column(id_col), value_set=vs))

        return docs.map_batches(keep, batch_format="pyarrow")
    inv_keyed = (
        inv_ds if id_col == "doc_id" else inv_ds.rename_columns({"doc_id": id_col})
    )
    # same empty-partition-side guard as _join_pair_sides
    n_parts = max(1, min(16, n_inv // 4096))
    return docs.join(inv_keyed, "inner", num_partitions=n_parts, on=(id_col,))


def minhash_near_dups(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    jaccard_threshold: float = 0.8,
    hot_band_cap: int = HOT_BAND_CAP,
    involved_broadcast_max: int = INVOLVED_BROADCAST_MAX,
) -> "ray.data.Dataset":
    """Near-duplicate pairs ``(doc_a, doc_b, est_jaccard)`` with
    ``doc_a < doc_b`` and signature-agreement estimate >= threshold.

    Scale shape:
    - signature stage: map-only, vectorized; ships (doc_id, 16 band rows
      of ~24 B) — the 512-B signature itself never enters the shuffle.
    - candidates: groupby the band key with a hot-band star cap (see
      :func:`_band_candidates`) — an all-to-all of band rows only,
      bounded pair output even under giant duplicate clusters.
    - estimate: fully distributed. The verify reads the SAME materialized
      signature table the candidate stage derived its bands from,
      filtered to the involved docs via :func:`_involved_rows`
      (broadcast ``is_in`` under ``involved_broadcast_max`` distinct
      ids, distributed semi-join above it — a 90%-duplicate corpus
      never gathers a corpus-sized id list); pairs join it twice (both
      sides output-sized) and the agreement estimate is a vectorized
      per-batch kernel. No pair set is ever gathered.

    Single signature pass (round 5): signatures are computed ONCE into a
    materialized (id, 512-B sig) table feeding both the band stage and
    the verify — previously the band stage hashed the corpus and the
    verify re-read + re-hashed the involved docs, which on a
    high-duplication corpus (involved ≈ everyone) doubled the dominant
    tokenize+md5 cost. The sig table is ~512 B/doc (an order smaller
    than the text), spillable, corpus-partitioned.
    """
    import ray  # noqa: F401  (ray.data used via ds)

    import pyarrow.compute as pc

    def sig_rows(batch: pa.Table) -> pa.Table:
        sigs, has_sig = minhash_signatures_batch(batch.column(text_col).to_pylist())
        keep_idx = np.flatnonzero(has_sig)
        return pa.table(
            {
                id_col: pc.take(
                    batch.column(id_col), pa.array(keep_idx, pa.int64())
                ).cast(pa.int64()),
                "sig": pa.array([sigs[i].tobytes() for i in keep_idx], pa.binary()),
            }
        )

    sig_ds = (
        ds.select_columns([id_col, text_col])
        .map_batches(sig_rows, batch_format="pyarrow")
        .materialize()
    )
    pairs, a_col, b_col = _band_candidates_from_sigs(sig_ds, id_col, hot_band_cap)
    n_pairs = pairs.count()
    if n_pairs == 0:
        return ray.data.from_arrow(_EMPTY_EST_PAIRS)
    payload = _involved_rows(
        sig_ds, pairs, id_col, ["sig"], a_col, b_col, involved_broadcast_max
    )
    return _minhash_verify(
        pairs, payload, id_col, a_col, b_col, n_pairs, jaccard_threshold
    )


_EMPTY_EST_PAIRS = pa.table(
    {
        "doc_a": pa.array([], pa.int64()),
        "doc_b": pa.array([], pa.int64()),
        "est_jaccard": pa.array([], pa.float64()),
    }
)


def _minhash_verify(
    pairs: "ray.data.Dataset",
    sig_ds: "ray.data.Dataset",
    id_col: str,
    a_col: str,
    b_col: str,
    n_pairs: int,
    jaccard_threshold: float,
    sort: bool = True,
) -> "ray.data.Dataset":
    """Signature-agreement verify of a candidate pair set against a
    per-doc signature table (``id_col``, ``sig`` binary) — the tail of
    :func:`minhash_near_dups`, shared with :func:`ensemble_near_dups`
    which feeds it the pre-materialized shared signature store."""
    empty = _EMPTY_EST_PAIRS

    def verify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        sig_a = np.frombuffer(
            b"".join(t.column("sig_a").to_pylist()), dtype=np.uint64
        ).reshape(-1, N_HASHES)
        sig_b = np.frombuffer(
            b"".join(t.column("sig_b").to_pylist()), dtype=np.uint64
        ).reshape(-1, N_HASHES)
        est = (sig_a == sig_b).mean(axis=1)
        keep = pa.array(est >= jaccard_threshold)
        return pa.table(
            {
                "doc_a": t.column(a_col).filter(keep),
                "doc_b": t.column(b_col).filter(keep),
                "est_jaccard": pa.array(est[np.asarray(keep)], pa.float64()),
            }
        )

    out = _join_pair_sides(
        pairs, sig_ds, id_col, a_col, b_col, "sig", n_pairs
    ).map_batches(verify, batch_format="pyarrow")
    return out.sort(["doc_a", "doc_b"]) if sort else out


def _join_pair_sides(
    pairs: "ray.data.Dataset",
    side_ds: "ray.data.Dataset",
    id_col: str,
    a_col: str,
    b_col: str,
    payload: str,
    n_pairs: int,
) -> "ray.data.Dataset":
    """Distributed join of the candidate pair set against a per-doc
    payload table (signatures / shingle hashes), once per side. Both
    inputs are output-sized; partitions scale with the pair count.

    Partition count floors at 1 for small sets: Ray 2.49's hash join
    crashes on a partition with rows on only one side (pyarrow FieldRef
    'no match' on the synthesized empty table), so partitions are added
    only when each is statistically guaranteed thousands of rows."""
    side_a = side_ds.rename_columns({id_col: a_col, payload: f"{payload}_a"})
    side_b = side_ds.rename_columns({id_col: b_col, payload: f"{payload}_b"})
    n_parts = max(1, min(16, n_pairs // 4096))
    joined = pairs.join(side_a, "inner", num_partitions=n_parts, on=(a_col,))
    return joined.join(side_b, "inner", num_partitions=n_parts, on=(b_col,))


# --- SimHash ---------------------------------------------------------------

_BITS = np.arange(64, dtype=np.uint64)


def simhash_batch(texts: list[str]) -> np.ndarray:
    """Vectorized 64-bit simhash per text (token multiplicity counts,
    like the classic weighted sketch). Empty docs -> 0."""
    n = len(texts)
    out = np.zeros(n, dtype=np.uint64)
    flat: list[int] = []
    offsets: list[int] = []
    doc_idx: list[int] = []
    for i, t in enumerate(texts):
        toks = _tokens((t or "").lower())
        if not toks:
            continue
        offsets.append(len(flat))
        doc_idx.append(i)
        flat.extend(md5_u64(tok) for tok in toks)
    if not doc_idx:
        return out
    h = np.array(flat, dtype=np.uint64)
    bits = ((h[:, None] >> _BITS[None, :]) & np.uint64(1)).astype(np.int32)
    votes = np.add.reduceat(bits * 2 - 1, np.array(offsets, dtype=np.int64), axis=0)
    sketch = ((votes > 0).astype(np.uint64) << _BITS[None, :]).sum(
        axis=1, dtype=np.uint64
    )
    out[np.array(doc_idx, dtype=np.int64)] = sketch
    return out


def simhash64(text: str) -> int:
    return int(simhash_batch([text])[0])


def simhash_dups(
    ds: "ray.data.Dataset", id_col: str = "doc_id", text_col: str = "text"
) -> "ray.data.Dataset":
    """Groups of documents sharing an identical 64-bit simhash.

    (simhash, n_docs, doc_id=min). Near-dup (hamming<=k) variants bucket on
    rotated prefixes; exact-match grouping is the deterministic core.
    """

    def sketch(batch: pa.Table) -> pa.Table:
        hashes = simhash_batch(batch.column(text_col).to_pylist())
        return pa.table(
            {
                "simhash": pa.array([f"{int(h):016x}" for h in hashes], pa.string()),
                id_col: batch.column(id_col),
            }
        )

    from ray.data.aggregate import Count, Min

    return (
        ds.map_batches(sketch, batch_format="pyarrow")
        .groupby("simhash")
        .aggregate(Min(id_col, alias_name="doc_id"), Count(alias_name="n_docs"))
    )


def simhash_near_dups(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    n_tables: int = 4,
    hot_prefix_cap: int = HOT_BAND_CAP,
) -> "ray.data.Dataset":
    """Near-dup pairs by simhash hamming distance <= ``max_hamming``.

    The classic rotated-prefix LSH for hamming space: ``n_tables`` views
    of the 64-bit sketch, each rotated by 16 bits, bucketed on the
    leading 16 bits — a pair within hamming k collides in some table
    unless its differing bits straddle every rotation window. Candidates
    AND the xor+popcount verify happen inside a (table, prefix) groupby:
    the sketch travels with its group row (24 B constant), so no join and
    nothing corpus-proportional beyond the band rows shuffles. Buckets
    over ``hot_prefix_cap`` verify only the star against the min id
    (m-1 checks, connectivity-preserving for hamming clusters) instead of
    m^2/2 — the same giant-duplicate-cluster guard as
    :func:`_band_candidates`. Output: (doc_a, doc_b, hamming), distinct.
    """

    def sketch_rows(batch: pa.Table) -> pa.Table:
        hashes = simhash_batch(batch.column(text_col).to_pylist())
        return _simhash_expand(batch.column(id_col).to_pylist(), hashes, id_col, n_tables)

    rows = ds.map_batches(sketch_rows, batch_format="pyarrow")
    return _simhash_verify_tail(rows, id_col, max_hamming, hot_prefix_cap)


def _simhash_expand(
    ids: list, hashes, id_col: str, n_tables: int
) -> pa.Table:
    """(table_id, prefix, id, simhash-hex) LSH rows from per-doc 64-bit
    sketches — the rotated-prefix expansion of :func:`simhash_near_dups`,
    shared with the precomputed-sketch path in
    :func:`ensemble_near_dups`."""
    t_ids, prefixes, out_ids, sketches = [], [], [], []
    for doc, h in zip(ids, hashes):
        hx = f"{int(h):016x}"
        rolled = hx + hx
        for t in range(n_tables):
            t_ids.append(t)
            prefixes.append(rolled[4 * t : 4 * t + 4])
            out_ids.append(doc)
            sketches.append(hx)
    return pa.table(
        {
            "table_id": pa.array(t_ids, pa.int32()),
            "prefix": pa.array(prefixes, pa.string()),
            id_col: pa.array(out_ids),
            "simhash": pa.array(sketches, pa.string()),
        }
    )


def _simhash_verify_tail(
    rows: "ray.data.Dataset",
    id_col: str,
    max_hamming: int,
    hot_prefix_cap: int,
) -> "ray.data.Dataset":
    """Bucket-group + xor/popcount verify over the expanded LSH rows —
    the shuffle/verify half of :func:`simhash_near_dups`."""
    empty = pa.table(
        {
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
            "hamming": pa.array([], pa.int64()),
        }
    )

    def emit_verified(group: pa.Table) -> pa.Table:
        m = group.num_rows
        if m < 2:
            return empty
        ids_raw = np.asarray(group.column(id_col).to_pylist(), dtype=np.int64)
        order = np.argsort(ids_raw)
        ids = ids_raw[order]
        sk = np.array(
            [int(h, 16) for h in group.column("simhash").to_pylist()],
            dtype=np.uint64,
        )[order]
        if m <= hot_prefix_cap:
            ii, jj = np.triu_indices(m, k=1)
        else:  # hot prefix: star to the min id
            ii = np.zeros(m - 1, dtype=np.int64)
            jj = np.arange(1, m, dtype=np.int64)
        diff = np.bitwise_xor(sk[ii], sk[jj])
        ham = np.unpackbits(diff.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)
        keep = ham <= max_hamming
        return pa.table(
            {
                "doc_a": pa.array(ids[ii[keep]], pa.int64()),
                "doc_b": pa.array(ids[jj[keep]], pa.int64()),
                "hamming": pa.array(ham[keep].astype(np.int64), pa.int64()),
            }
        )

    # cross-table pair dedupe (a hamming<=k pair collides in up to
    # n_tables tables) via ONE xor-mix hash-partition + per-partition
    # arrow group_by — the sf10 stress run measured the previous
    # sort-based Aggregate over the pair domain as this operator's
    # scale-killer on a high-duplication corpus (~25M distinct pairs x 4
    # tables of rows through a global sort; BASELINE session-8).
    def add_p(t: pa.Table) -> pa.Table:
        a = t.column("doc_a").to_numpy(zero_copy_only=False)
        b = t.column("doc_b").to_numpy(zero_copy_only=False)
        return t.append_column("_p", pa.array(xor_mix_parts([a, b], _BAND_PARTS)))

    def min_ham(t: pa.Table) -> pa.Table:
        g = (
            t.drop_columns(["_p"])
            .group_by(["doc_a", "doc_b"])
            .aggregate([("hamming", "min")])
        )
        return g.rename_columns(["doc_a", "doc_b", "hamming"])

    return (
        rows.groupby(["table_id", "prefix"])
        .map_groups(emit_verified, batch_format="pyarrow")
        .map_batches(add_p, batch_format="pyarrow")
        .groupby("_p")
        .map_groups(min_ham, batch_format="pyarrow")
    )


def ngram_jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    """Exact k-shingle Jaccard — the verifier used inside LSH buckets.
    Docs without shingles compare equal only to other empty docs."""
    a, b = _shingles(text_a, k), _shingles(text_b, k)
    if not a and not b:
        return 1.0
    return len(a & b) / max(1, len(a | b))


def ngram_near_dups(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    jaccard_threshold: float = 0.8,
    hot_band_cap: int = HOT_BAND_CAP,
    involved_broadcast_max: int = INVOLVED_BROADCAST_MAX,
) -> "ray.data.Dataset":
    """Exact-Jaccard near-dup pairs ``(doc_a, doc_b, jaccard)``.

    Same scale shape as :func:`minhash_near_dups` — LSH band candidates
    with the hot-band star cap, never all-pairs — but the verify step
    computes the TRUE distinct-3-shingle Jaccard of each candidate pair
    (``np.intersect1d`` over per-doc sorted shingle-hash arrays) instead
    of the signature estimate. Verify is a distributed join of the pair
    set against the involved docs' shingle arrays; the involved-doc
    filter is :func:`_involved_docs` (broadcast under the id-count bound,
    distributed semi-join above it) — no pair set or corpus-sized id
    list ever reaches the driver.
    """
    import ray  # noqa: F401

    import pyarrow.compute as pc

    def store_rows(batch: pa.Table) -> pa.Table:
        # one tokenize + shingle-md5 pass serves BOTH the band stage and
        # the exact-Jaccard verify (previously the verify re-read and
        # re-hashed the involved docs — corpus-sized work on a
        # high-duplication corpus); simhash is skipped, its token-md5
        # pass is not needed here
        sigs, has_sig, hash_arrays, _ = combined_signature_batch(
            batch.column(text_col).to_pylist(), with_simhash=False
        )
        keep_idx = np.flatnonzero(has_sig)
        return pa.table(
            {
                id_col: pc.take(
                    batch.column(id_col), pa.array(keep_idx, pa.int64())
                ).cast(pa.int64()),
                "sig": pa.array([sigs[i].tobytes() for i in keep_idx], pa.binary()),
                "hashes": pa.array(
                    [hash_arrays[i].tobytes() for i in keep_idx], pa.binary()
                ),
            }
        )

    store = (
        ds.select_columns([id_col, text_col])
        .map_batches(store_rows, batch_format="pyarrow")
        .materialize()
    )
    pairs, a_col, b_col = _band_candidates_from_sigs(store, id_col, hot_band_cap)
    empty = pa.table(
        {
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
            "jaccard": pa.array([], pa.float64()),
        }
    )
    n_pairs = pairs.count()
    if n_pairs == 0:
        return ray.data.from_arrow(empty)
    hash_ds = _involved_rows(
        store, pairs, id_col, ["hashes"], a_col, b_col, involved_broadcast_max
    )
    return _jaccard_verify_from_hashes(
        pairs, hash_ds, id_col, a_col, b_col, n_pairs, jaccard_threshold
    ).sort(["doc_a", "doc_b"])


def shingle_hash_table(
    kept: pa.Table, id_col: str = "doc_id", text_col: str = "text"
) -> pa.Table:
    """(id, sorted md5-u64 shingle hashes as binary) per doc — the
    per-doc payload the exact-Jaccard verify joins against."""
    ids, arrays = [], []
    for doc, text in zip(
        kept.column(id_col).to_pylist(), kept.column(text_col).to_pylist()
    ):
        sh = _shingles(text or "")
        if not sh:
            continue
        ids.append(doc)
        arrays.append(
            np.sort(np.fromiter((md5_u64(s) for s in sh), dtype=np.uint64))
        )
    return pa.table(
        {
            id_col: pa.array(ids, pa.int64()),
            "hashes": pa.array([a.tobytes() for a in arrays], pa.binary()),
        }
    )


def exact_jaccard_verify(
    pairs: "ray.data.Dataset",
    ds: "ray.data.Dataset",
    id_col: str,
    text_col: str,
    a_col: str,
    b_col: str,
    n_pairs: int,
    jaccard_threshold: float,
    involved_broadcast_max: int = INVOLVED_BROADCAST_MAX,
) -> "ray.data.Dataset":
    """TRUE distinct-shingle Jaccard of each candidate pair, distributed:
    involved docs (broadcast-filter or semi-join, by id count) supply
    sorted shingle-hash arrays; the pair set joins both sides
    (:func:`_join_pair_sides`) and verifies in one vectorized-per-pair
    pass. Shared by the LSH-candidate ``ngram_near_dups`` and the
    exact prefix-filter ``setjoin.similarity_join``."""
    involved = _involved_docs(
        ds, pairs, id_col, text_col, a_col, b_col, involved_broadcast_max
    )
    hash_ds = involved.map_batches(
        lambda t: shingle_hash_table(t, id_col, text_col),
        batch_format="pyarrow",
    ).materialize()
    return _jaccard_verify_from_hashes(
        pairs, hash_ds, id_col, a_col, b_col, n_pairs, jaccard_threshold
    )


def _jaccard_verify_from_hashes(
    pairs: "ray.data.Dataset",
    hash_ds: "ray.data.Dataset",
    id_col: str,
    a_col: str,
    b_col: str,
    n_pairs: int,
    jaccard_threshold: float,
) -> "ray.data.Dataset":
    """Join+verify half of :func:`exact_jaccard_verify`, taking the
    per-doc sorted shingle-hash table (``id_col``, ``hashes`` binary)
    directly — shared with :func:`ensemble_near_dups`, which supplies it
    from the one-pass signature store instead of re-hashing text."""

    def verify(t: pa.Table) -> pa.Table:
        # per-pair loop is fine here: the candidate set is output-sized
        out_a, out_b, out_j = [], [], []
        for a, b, ha, hb in zip(
            t.column(a_col).to_pylist(),
            t.column(b_col).to_pylist(),
            t.column("hashes_a").to_pylist(),
            t.column("hashes_b").to_pylist(),
        ):
            va = np.frombuffer(ha, dtype=np.uint64)
            vb = np.frombuffer(hb, dtype=np.uint64)
            inter = np.intersect1d(va, vb, assume_unique=True).size
            jac = inter / (va.size + vb.size - inter)
            if jac >= jaccard_threshold:
                out_a.append(int(a))
                out_b.append(int(b))
                out_j.append(jac)
        return pa.table(
            {
                "doc_a": pa.array(out_a, pa.int64()),
                "doc_b": pa.array(out_b, pa.int64()),
                "jaccard": pa.array(out_j, pa.float64()),
            }
        )

    return _join_pair_sides(
        pairs, hash_ds, id_col, a_col, b_col, "hashes", n_pairs
    ).map_batches(verify, batch_format="pyarrow")


# --- Shared one-pass signature store + ensemble ----------------------------


def combined_signature_batch(
    texts: list[str],
    with_simhash: bool = True,
) -> tuple[np.ndarray, np.ndarray, list, np.ndarray]:
    """ONE tokenize pass per doc -> everything the three near-dup
    families need: ``(minhash sigs, has_sig, sorted shingle-hash arrays,
    simhash)``.

    Produces bit-identical values to running
    :func:`minhash_signatures_batch`, :func:`shingle_hash_table` and
    :func:`simhash_batch` separately (the per-family oracles are
    unchanged), but tokenizes each text once and md5-hashes each
    distinct shingle once instead of three tokenize passes + two
    shingle-hash passes — the kernel behind
    :func:`ensemble_near_dups`'s single corpus scan.
    """
    n = len(texts)
    sigs = np.full((n, N_HASHES), np.iinfo(np.uint64).max, dtype=np.uint64)
    has_sig = np.zeros(n, dtype=bool)
    sim = np.zeros(n, dtype=np.uint64)
    hash_arrays: list = [None] * n
    tok_flat: list[int] = []
    tok_offsets: list[int] = []
    tok_doc: list[int] = []
    sh_flat: list[int] = []
    sh_offsets: list[int] = []
    sh_doc: list[int] = []
    for i, t in enumerate(texts):
        toks = _tokens(t or "")
        if toks and with_simhash:
            tok_offsets.append(len(tok_flat))
            tok_doc.append(i)
            tok_flat.extend(md5_u64(tok) for tok in toks)
        if len(toks) >= 3:
            sh = {" ".join(toks[j : j + 3]) for j in range(len(toks) - 2)}
            sh_offsets.append(len(sh_flat))
            sh_doc.append(i)
            sh_flat.extend(md5_u64(s) for s in sh)
            has_sig[i] = True
    if sh_doc:
        h = np.array(sh_flat, dtype=np.uint64)
        grid = h[:, None] ^ _XOR_C[None, :]
        mins = np.minimum.reduceat(grid, np.array(sh_offsets, dtype=np.int64), axis=0)
        sigs[np.array(sh_doc, dtype=np.int64)] = mins
        ends = sh_offsets[1:] + [len(sh_flat)]
        for d, s, e in zip(sh_doc, sh_offsets, ends):
            hash_arrays[d] = np.sort(h[s:e])
    if tok_doc:
        th = np.array(tok_flat, dtype=np.uint64)
        bits = ((th[:, None] >> _BITS[None, :]) & np.uint64(1)).astype(np.int32)
        votes = np.add.reduceat(
            bits * 2 - 1, np.array(tok_offsets, dtype=np.int64), axis=0
        )
        sim[np.array(tok_doc, dtype=np.int64)] = (
            (votes > 0).astype(np.uint64) << _BITS[None, :]
        ).sum(axis=1, dtype=np.uint64)
    return sigs, has_sig, hash_arrays, sim


def signature_store_rows(
    batch: pa.Table, id_col: str = "doc_id", text_col: str = "text"
) -> pa.Table:
    """Per-doc signature-store rows ``(id, sig, hashes, simhash)`` from
    one :func:`combined_signature_batch` pass. ``sig`` (512-B minhash
    signature) and ``hashes`` (sorted shingle md5-u64s) are null for
    docs with < 3 tokens — such docs never enter LSH pairing; every doc
    keeps a ``simhash`` row (empty text sketches to 0, matching
    :func:`simhash_batch`)."""
    texts = batch.column(text_col).to_pylist()
    sigs, has_sig, hash_arrays, sim = combined_signature_batch(texts)
    n = len(texts)
    return pa.table(
        {
            id_col: batch.column(id_col).cast(pa.int64()),
            "sig": pa.array(
                [sigs[i].tobytes() if has_sig[i] else None for i in range(n)],
                pa.binary(),
            ),
            "hashes": pa.array(
                [
                    hash_arrays[i].tobytes() if hash_arrays[i] is not None else None
                    for i in range(n)
                ],
                pa.binary(),
            ),
            "simhash": pa.array(sim),
        }
    )


def ensemble_near_dups(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    jaccard_threshold: float = 0.8,
    max_hamming: int = 3,
    n_tables: int = 4,
    hot_band_cap: int = HOT_BAND_CAP,
    involved_broadcast_max: int = INVOLVED_BROADCAST_MAX,
    min_votes: int = 2,
) -> "ray.data.Dataset":
    """Ensemble near-dup voting ``(doc_a, doc_b, n_votes)`` over the
    three families (minhash-estimate, simhash-hamming, exact n-gram
    Jaccard), ``n_votes >= min_votes`` — SAME pair semantics as running
    the three registered family pipelines and voting on the union, but
    over ONE corpus scan:

    - one :func:`signature_store_rows` pass materializes per-doc minhash
      signature + sorted shingle hashes + simhash (the only
      corpus-proportional materialization; at ingest scale this is the
      persisted signature store of ``functions/increment.py``);
    - ONE LSH candidate stage (:func:`_band_candidates_from_sigs`)
      serves both the minhash and ngram families — their candidate sets
      are identical by construction, previously computed twice;
    - both verifies read payloads from the store via one involved-id
      filter (:func:`_involved_rows`) instead of re-reading + re-hashing
      corpus text; the simhash family expands rotated prefixes from the
      stored sketch column.

    Scale shape: the store adds ~text-sized bytes to the object store
    (spillable, corpus-partitioned) and removes two full corpus
    scans + tokenize passes and two filtered recompute passes — the
    trade that wins whenever the corpus read+tokenize dominates, i.e.
    always at 100 TB.
    """
    import ray

    import pyarrow.compute as pc

    sig_ds = ds.map_batches(
        lambda t: signature_store_rows(t, id_col, text_col),
        batch_format="pyarrow",
    ).materialize()

    def sim_rows(t: pa.Table) -> pa.Table:
        return _simhash_expand(
            t.column(id_col).to_pylist(),
            t.column("simhash").to_numpy(zero_copy_only=False),
            id_col,
            n_tables,
        )

    sh_pairs = _simhash_verify_tail(
        sig_ds.select_columns([id_col, "simhash"]).map_batches(
            sim_rows, batch_format="pyarrow"
        ),
        id_col,
        max_hamming,
        hot_band_cap,
    )

    def pairs_only(t: pa.Table) -> pa.Table:
        return t.select(["doc_a", "doc_b"])

    pairs, a_col, b_col = _band_candidates_from_sigs(sig_ds, id_col, hot_band_cap)
    n_pairs = pairs.count()
    u = sh_pairs.map_batches(pairs_only, batch_format="pyarrow")
    if n_pairs > 0:
        payload = _involved_rows(
            sig_ds,
            pairs,
            id_col,
            ["sig", "hashes"],
            a_col,
            b_col,
            involved_broadcast_max,
        ).materialize()
        mh_pairs = _minhash_verify(
            pairs,
            payload.select_columns([id_col, "sig"]),
            id_col,
            a_col,
            b_col,
            n_pairs,
            jaccard_threshold,
            sort=False,
        )
        ng_pairs = _jaccard_verify_from_hashes(
            pairs,
            payload.select_columns([id_col, "hashes"]),
            id_col,
            a_col,
            b_col,
            n_pairs,
            jaccard_threshold,
        )
        u = u.union(
            mh_pairs.map_batches(pairs_only, batch_format="pyarrow")
        ).union(ng_pairs.map_batches(pairs_only, batch_format="pyarrow"))

    def add_p(t: pa.Table) -> pa.Table:
        a = t.column("doc_a").to_numpy(zero_copy_only=False)
        b = t.column("doc_b").to_numpy(zero_copy_only=False)
        return t.append_column("_p", pa.array(xor_mix_parts([a, b], 16)))

    def vote(t: pa.Table) -> pa.Table:
        g = (
            t.drop_columns(["_p"])
            .group_by(["doc_a", "doc_b"])
            .aggregate([([], "count_all")])
        )
        g = g.rename_columns(["doc_a", "doc_b", "n_votes"])
        return g.filter(pc.greater_equal(g.column("n_votes"), pa.scalar(min_votes)))

    return (
        u.map_batches(add_p, batch_format="pyarrow")
        .groupby("_p")
        .map_groups(vote, batch_format="pyarrow")
        .sort(["doc_a", "doc_b"])
    )
