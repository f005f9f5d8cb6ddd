"""Unit checks for the training-data operators (dedup / ANN / textstats)."""

import os

import numpy as np
import pyarrow as pa
import pytest

from webscraper_ray.functions.dedup import (
    minhash_signature,
    ngram_jaccard,
    simhash64,
)
from webscraper_ray.functions.textstats import quality_scores, token_stats


def test_minhash_signature_deterministic_and_similar():
    a = "the quick brown fox jumps over the lazy dog near the river bank today"
    b = "the quick brown fox jumps over the lazy dog near the river bank now"
    c = "completely different content about database systems and query engines"
    sa, sb, sc = (minhash_signature(t) for t in (a, b, c))
    assert np.array_equal(sa, minhash_signature(a))
    sim_ab = (sa == sb).mean()
    sim_ac = (sa == sc).mean()
    assert sim_ab > 0.5 > sim_ac


def test_ngram_jaccard_bounds():
    assert ngram_jaccard("a b c d", "a b c d") == 1.0
    assert ngram_jaccard("a b c d", "x y z w") == 0.0
    assert ngram_jaccard("", "") == 1.0


def test_simhash_similar_texts_close():
    a = simhash64("the quick brown fox jumps over the lazy dog " * 5)
    b = simhash64("the quick brown fox jumps over the lazy dog " * 5 + "tail")
    c = simhash64("entirely unrelated words about ray data pipelines " * 5)
    ham_ab = bin(a ^ b).count("1")
    ham_ac = bin(a ^ c).count("1")
    assert ham_ab < ham_ac
    assert simhash64("") == 0


def test_minhash_lsh_finds_planted_dups(ray_session):
    import ray.data

    from webscraper_ray.functions.dedup import minhash_near_dups

    base = "the quick brown fox jumps over the lazy dog near the river bank "
    rows = [{"doc_id": 0, "text": base * 6}, {"doc_id": 1, "text": base * 6 + "extra"}]
    rows += [
        {"doc_id": 10 + i, "text": f"unique document number {i} " + " ".join(
            f"tok{i}_{j}" for j in range(40)
        )}
        for i in range(20)
    ]
    ds = ray.data.from_items(rows)
    pairs = minhash_near_dups(ds).to_pandas()
    assert ((pairs.doc_a == 0) & (pairs.doc_b == 1)).any()
    # no false pairs among the unique docs
    assert not ((pairs.doc_a >= 10) | (pairs.doc_b >= 10)).any()


def test_minhash_hot_band_star_bounds_giant_cluster(ray_session):
    """A planted giant duplicate cluster must produce a BOUNDED pair set
    (star to the min id, m-1 pairs) instead of m^2/2, while staying fully
    connected through the representative; docs outside the cluster are
    untouched."""
    import ray.data

    from webscraper_ray.functions.dedup import _band_candidates, minhash_near_dups

    base = "all work and no play makes jack a dull boy " * 8
    m = 120
    rows = [{"doc_id": i, "text": base} for i in range(m)]
    rows += [
        {
            "doc_id": 1000 + i,
            "text": f"singleton {i} " + " ".join(f"w{i}_{j}" for j in range(40)),
        }
        for i in range(10)
    ]
    ds = ray.data.from_items(rows)
    pairs, a_col, b_col = _band_candidates(ds, "doc_id", "text", hot_band_cap=50)
    got = pairs.to_pandas()
    # identical docs collide in EVERY band; the star caps each band's
    # bucket at m-1 pairs, and every band emits the same star -> m-1
    # distinct pairs total, all anchored at the min id
    assert len(got) == m - 1
    assert (got[a_col] == 0).all()
    assert set(got[b_col]) == set(range(1, m))
    # end-to-end: the verified output preserves the star (est=1.0)
    out = minhash_near_dups(
        ray.data.from_items(rows), hot_band_cap=50
    ).to_pandas()
    cluster = out[(out.doc_a < 1000) & (out.doc_b < 1000)]
    assert len(cluster) == m - 1  # star pairs only, far below m^2/2 = 7140
    assert (cluster.est_jaccard == 1.0).all()
    # connectivity: every cluster member reachable from doc 0
    import collections

    adj = collections.defaultdict(set)
    for a, b in zip(cluster.doc_a, cluster.doc_b):
        adj[a].add(b)
        adj[b].add(a)
    seen, stack = {0}, [0]
    while stack:
        for nxt in adj[stack.pop()]:
            if nxt not in seen:
                seen.add(nxt)
                stack.append(nxt)
    assert seen == set(range(m))


def test_minhash_semi_join_path_no_driver_gather(ray_session, monkeypatch):
    """VERDICT r3 #1: on a high-duplication corpus (every doc in some
    candidate pair) the involved-id filter must NOT gather the id list
    driver-side. Force the semi-join plan with a tiny broadcast bound and
    booby-trap the broadcast helper — the run must succeed and match the
    broadcast plan's output exactly."""
    import ray.data

    from webscraper_ray.functions import dedup

    base = "we choose to go to the moon in this decade and do the other things "
    # 30 dup docs (all involved) + a few singletons
    rows = [{"doc_id": i, "text": base * 5} for i in range(30)]
    rows += [
        {
            "doc_id": 100 + i,
            "text": f"lonely {i} " + " ".join(f"z{i}_{j}" for j in range(40)),
        }
        for i in range(5)
    ]

    want = dedup.minhash_near_dups(ray.data.from_items(rows)).to_pandas()
    want_ng = dedup.ngram_near_dups(ray.data.from_items(rows)).to_pandas()

    def boom(_inv_ds):
        raise AssertionError("driver-side involved-id gather on the semi-join path")

    monkeypatch.setattr(dedup, "_involved_ids_ref", boom)
    got = dedup.minhash_near_dups(
        ray.data.from_items(rows), involved_broadcast_max=1
    ).to_pandas()
    assert got.equals(want)
    got_ng = dedup.ngram_near_dups(
        ray.data.from_items(rows), involved_broadcast_max=1
    ).to_pandas()
    assert got_ng.equals(want_ng)


def test_simhash_hot_prefix_star_bounds_giant_cluster(ray_session):
    """Identical sketches in a giant cluster collide in every rotation
    table; over the cap each (table, prefix) bucket verifies only the
    star -> m-1 distinct pairs (hamming 0), not m^2/2."""
    import ray.data

    from webscraper_ray.functions.dedup import simhash_near_dups

    base = "tell me and i forget teach me and i remember involve me and i learn "
    m = 80
    rows = [{"doc_id": i, "text": base * 4} for i in range(m)]
    out = simhash_near_dups(
        ray.data.from_items(rows), hot_prefix_cap=30
    ).to_pandas()
    assert len(out) == m - 1
    assert (out.doc_a == 0).all() and (out.hamming == 0).all()
    assert set(out.doc_b) == set(range(1, m))


def test_ann_lsh_recall_vs_bruteforce(ray_session):
    import ray.data

    from webscraper_ray.functions.ann import ann_bruteforce_topk, ann_lsh_topk

    rng = np.random.default_rng(7)
    mat = rng.standard_normal((300, 16)).astype(np.float64)
    rows = [{"vec_id": i, "embedding": mat[i].tolist()} for i in range(300)]
    ds = ray.data.from_items(rows)
    qids, qmat = [0, 1], mat[:2]
    exact = ann_bruteforce_topk(ds, qids, qmat, k=5).to_pandas()
    approx = ann_lsh_topk(ray.data.from_items(rows), qids, qmat, k=5, bits=2).to_pandas()
    # the query vector itself must be its own top hit in both
    for q in qids:
        top_exact = exact[exact.query_id == q].sort_values(
            "cos_sim", ascending=False
        ).iloc[0]
        assert top_exact.vec_id == q and top_exact.cos_sim == 1.0
        got = approx[approx.query_id == q]
        assert (got.vec_id == q).any()
    # recall@5 of the bucketed variant is reported, not asserted exact
    inter = len(
        set(map(tuple, exact[["query_id", "vec_id"]].values))
        & set(map(tuple, approx[["query_id", "vec_id"]].values))
    )
    assert inter >= 2  # at minimum the self-hits


def test_ann_index_probe_prunes_files(ray_session, tmp_path, monkeypatch):
    """The bucket-partitioned index probe must (a) return exactly the
    full-scan LSH result and (b) READ only the bucket=K dirs its queries
    hash to — file-level pruning, not a corpus scan."""
    import ray.data

    import webscraper_ray.functions.ann as ann_mod
    from webscraper_ray.functions.ann import (
        _bucket_of,
        _plane_matrix,
        ann_lsh_topk,
        ann_lsh_topk_indexed,
        build_ann_index,
    )

    rng = np.random.default_rng(11)
    n, dim, bits = 400, 16, 3
    mat = rng.standard_normal((n, dim)).astype(np.float64)
    rows = [{"vec_id": i, "embedding": mat[i].tolist()} for i in range(n)]
    idx = str(tmp_path / "ann_index")
    build_ann_index(ray.data.from_items(rows), idx, bits=bits)

    planes = _plane_matrix(dim, bits)
    all_buckets = set(_bucket_of(mat, planes).tolist())
    on_disk = {d for d in os.listdir(idx) if d.startswith("bucket=")}
    assert on_disk == {f"bucket={b}" for b in all_buckets} and len(on_disk) > 1

    qids, qmat = [0, 1, 2], mat[:3]
    q_buckets = set(_bucket_of(qmat, planes).tolist())

    read_paths: list[list[str]] = []
    real_read = ray.data.read_parquet

    def spy_read(paths, **kw):
        read_paths.append(list(paths) if isinstance(paths, list) else [paths])
        return real_read(paths, **kw)

    monkeypatch.setattr(ann_mod.ray.data, "read_parquet", spy_read)
    got = ann_lsh_topk_indexed(idx, qids, qmat, k=5, bits=bits).to_pandas()
    want = ann_lsh_topk(
        ray.data.from_items(rows), qids, qmat, k=5, bits=bits
    ).to_pandas()

    key = ["query_id", "vec_id"]
    got_s = got.sort_values(key).reset_index(drop=True)
    want_s = want.sort_values(key).reset_index(drop=True)
    assert got_s[key + ["cos_sim"]].equals(want_s[key + ["cos_sim"]])

    # the probe read ONLY files under the query buckets' dirs — a strict
    # subset of the corpus partitions
    assert len(read_paths) == 1
    probed = {os.path.basename(os.path.dirname(p)) for p in read_paths[0]}
    assert probed == {f"bucket={b}" for b in q_buckets}
    assert probed < on_disk


def test_token_stats_empty_and_unicode():
    batch = pa.table({"doc_id": [1, 2, 3], "text": ["", "  ", "héllo wörld x"]})
    out = token_stats(batch).to_pydict()
    assert out["n_tokens"] == [0, 0, 3]


def test_quality_scores_rounding_matches_sql_semantics():
    batch = pa.table({"doc_id": [1], "text": ["Ab cd. EF!"]})
    out = quality_scores(batch).to_pydict()
    # 3 tokens? "Ab", "cd.", "EF!" -> mean len = (2+3+3)/3 = 2.6667
    assert out["n_tokens"] == [3]
    assert out["mean_token_len"] == [2.6667]
    assert out["punct_ratio"] == [round(2 / 10, 4)]
    assert out["upper_ratio"] == [round(3 / 10, 4)]


def test_embed_cosine_dups_finds_planted_neighbors(ray_session):
    import ray.data

    from webscraper_ray.functions.ann import embed_cosine_dups

    rng = np.random.default_rng(11)
    base = rng.standard_normal(64)
    rows = [
        {"vec_id": 0, "embedding": base.tolist()},
        {"vec_id": 1, "embedding": (base + 0.05 * rng.standard_normal(64)).tolist()},
    ]
    rows += [
        {"vec_id": 10 + i, "embedding": rng.standard_normal(64).tolist()}
        for i in range(30)
    ]
    ds = ray.data.from_items(rows)
    out = embed_cosine_dups(ds, threshold=0.9, bits=2, dim=64).to_pandas()
    assert ((out.vec_a == 0) & (out.vec_b == 1)).any()
    assert (out.cos_sim >= 0.9).all()


def test_embed_cosine_hot_bucket_star_bounds_giant_cluster(ray_session):
    """A planted giant cluster of identical vectors lands in one LSH
    bucket; over the cap the bucket emits only the star against the min
    id (m-1 pairs, cos 1.0), not the m^2/2 matmul pairs."""
    import ray.data

    from webscraper_ray.functions.ann import embed_cosine_dups

    rng = np.random.default_rng(23)
    base = rng.standard_normal(64)
    m = 60
    rows = [{"vec_id": i, "embedding": base.tolist()} for i in range(m)]
    out = embed_cosine_dups(
        ray.data.from_items(rows), threshold=0.9, bits=2, dim=64, hot_bucket_cap=30
    ).to_pandas()
    assert len(out) == m - 1
    assert (out.vec_a == 0).all() and (out.cos_sim == 1.0).all()
    assert set(out.vec_b) == set(range(1, m))


def test_ngram_near_dups_exact_jaccard(ray_session):
    import ray.data

    from webscraper_ray.functions.dedup import ngram_jaccard, ngram_near_dups

    base = "the quick brown fox jumps over the lazy dog near the river bank "
    rows = [{"doc_id": 0, "text": base * 6}, {"doc_id": 1, "text": base * 6 + "extra"}]
    rows += [
        {"doc_id": 10 + i, "text": " ".join(f"tok{i}_{j}" for j in range(40))}
        for i in range(10)
    ]
    out = ngram_near_dups(ray.data.from_items(rows)).to_pandas()
    assert len(out) == 1 and out.doc_a[0] == 0 and out.doc_b[0] == 1
    # the reported jaccard IS the exact shingle jaccard
    want = ngram_jaccard(rows[0]["text"], rows[1]["text"])
    assert abs(out.jaccard[0] - want) < 1e-12


def test_simhash_near_dups_finds_close_sketches(ray_session):
    import ray.data

    from webscraper_ray.functions.dedup import simhash_near_dups

    base = "the quick brown fox jumps over the lazy dog " * 8
    rows = [{"doc_id": 0, "text": base}, {"doc_id": 1, "text": base + "tail word"}]
    rows += [
        {"doc_id": 10 + i, "text": " ".join(f"w{i}_{j}" for j in range(60))}
        for i in range(15)
    ]
    out = simhash_near_dups(ray.data.from_items(rows)).to_pandas()
    assert ((out.doc_a == 0) & (out.doc_b == 1)).any()
    assert (out.hamming <= 3).all()


# --- temporal joins (functions/joins.py) ------------------------------------


def _mk_ds(rows, schema):
    import pyarrow as pa
    import ray.data

    return ray.data.from_arrow(pa.table(rows, schema=schema))


def test_asof_join_tie_breaks_to_max_tiebreak(ray_session):
    import pyarrow as pa

    from webscraper_ray.functions.joins import asof_join

    us = pa.timestamp("us")
    left = _mk_ds(
        {"eid": [1, 2], "k": [7, 7], "ts": [1_000_000, 50]},
        pa.schema([("eid", pa.int64()), ("k", pa.int64()), ("ts", us)]),
    )
    # two right rows at the SAME (key, ts): the greater tie_break wins
    right = _mk_ds(
        {"k": [7, 7, 7], "rts": [500, 500, 2_000_000], "oid": [10, 11, 12]},
        pa.schema([("k", pa.int64()), ("rts", us), ("oid", pa.int64())]),
    )
    out = (
        asof_join(
            left,
            right,
            left_key="k",
            left_ts="ts",
            right_key="k",
            right_ts="rts",
            right_payload=["oid"],
        )
        .to_pandas()
        .sort_values("eid")
    )
    # eid=1 (ts=1s): latest <= is ts=500 pair -> max oid = 11
    # eid=2 (ts=50us): no right row at or before -> dropped (inner)
    assert out["eid"].tolist() == [1]
    assert out["oid"].tolist() == [11]


def test_asof_join_keys_never_cross(ray_session):
    import pyarrow as pa

    from webscraper_ray.functions.joins import asof_join

    us = pa.timestamp("us")
    left = _mk_ds(
        {"eid": [1], "k": [1], "ts": [100]},
        pa.schema([("eid", pa.int64()), ("k", pa.int64()), ("ts", us)]),
    )
    right = _mk_ds(
        {"k": [2], "rts": [50], "oid": [99]},
        pa.schema([("k", pa.int64()), ("rts", us), ("oid", pa.int64())]),
    )
    out = asof_join(
        left,
        right,
        left_key="k",
        left_ts="ts",
        right_key="k",
        right_ts="rts",
        right_payload=["oid"],
    ).to_pandas()
    assert len(out) == 0  # key 2's row must not match key 1


def test_range_count_join_window_edges(ray_session):
    import pyarrow as pa

    from webscraper_ray.functions.joins import range_count_join

    us = pa.timestamp("us")
    left = _mk_ds(
        {"eid": [1], "k": [5], "ts": [1_000]},
        pa.schema([("eid", pa.int64()), ("k", pa.int64()), ("ts", us)]),
    )
    # window [ts-100, ts): 900 included (left edge inclusive), 1000
    # excluded (right edge exclusive), 899 out, other key out
    right = _mk_ds(
        {"k": [5, 5, 5, 6], "rts": [900, 1_000, 899, 950]},
        pa.schema([("k", pa.int64()), ("rts", us)]),
    )
    out = range_count_join(
        left,
        right,
        left_key="k",
        left_ts="ts",
        right_key="k",
        right_ts="rts",
        lo_offset_us=-100,
        hi_offset_us=0,
        count_as="n",
    ).to_pandas()
    assert out["n"].tolist() == [1]


def test_range_count_join_keeps_zero_count_rows(ray_session):
    import pyarrow as pa

    from webscraper_ray.functions.joins import range_count_join

    us = pa.timestamp("us")
    left = _mk_ds(
        {"eid": [1, 2], "k": [5, 8], "ts": [1_000, 1_000]},
        pa.schema([("eid", pa.int64()), ("k", pa.int64()), ("ts", us)]),
    )
    right = _mk_ds(
        {"k": [5], "rts": [999]},
        pa.schema([("k", pa.int64()), ("rts", us)]),
    )
    out = (
        range_count_join(
            left,
            right,
            left_key="k",
            left_ts="ts",
            right_key="k",
            right_ts="rts",
            lo_offset_us=-100,
            hi_offset_us=0,
            count_as="n",
        )
        .to_pandas()
        .sort_values("eid")
    )
    assert out["eid"].tolist() == [1, 2]  # left semantics: key 8 kept
    assert out["n"].tolist() == [1, 0]


def test_join_composite_overflow_guard():
    import numpy as np

    from webscraper_ray.functions.joins import _check_no_overflow
    import pytest

    with pytest.raises(OverflowError):
        _check_no_overflow(np.array([2**62]), 4)
    _check_no_overflow(np.array([1000]), 4)  # small keys pass


# --- ranking / sampling / quantiles ------------------------------------------


def test_topk_kernel_orders_desc_ties_asc():
    import pyarrow as pa

    from webscraper_ray.functions.ranking import _topk_kernel

    t = pa.table(
        {
            "k": [1, 1, 1, 2, 2],
            "v": [5.0, 9.0, 9.0, 3.0, 4.0],
            "tid": [30, 20, 10, 1, 2],
        }
    )
    out = _topk_kernel(t, "k", "v", "tid", 2).to_pandas()
    got = sorted(zip(out["k"], out["tid"]))
    # key 1: two v=9 rows win, tie ascends -> tid 10 then 20; key 2: both
    assert got == [(1, 10), (1, 20), (2, 1), (2, 2)]


def test_topk_per_group_matches_single_table(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from webscraper_ray.functions.ranking import _topk_kernel, topk_per_group

    rng = np.random.default_rng(7)
    t = pa.table(
        {
            "k": rng.integers(0, 40, 2000),
            "v": rng.normal(size=2000),
            "tid": np.arange(2000),
        }
    )
    ds = ray.data.from_arrow(t).repartition(8)
    out = (
        topk_per_group(ds, key="k", order_col="v", tie_col="tid", k=3)
        .to_pandas()
        .sort_values(["k", "tid"])
        .reset_index(drop=True)
    )
    want = (
        _topk_kernel(t, "k", "v", "tid", 3)
        .to_pandas()
        .sort_values(["k", "tid"])
        .reset_index(drop=True)
    )
    assert out.equals(want)


def test_stratified_sample_deterministic_and_stratified(ray_session):
    import pyarrow as pa
    import ray.data

    from webscraper_ray.functions.dedup import md5_u64
    from webscraper_ray.functions.sampling import stratified_sample

    t = pa.table(
        {"id": list(range(400)), "s": (["a"] * 200 + ["b"] * 200)}
    )
    ds = ray.data.from_arrow(t).repartition(4)
    out = stratified_sample(
        ds, id_col="id", stratum_col="s", rates_pct={"a": 0}, default_pct=100
    ).to_pandas()
    assert set(out["s"]) == {"b"} and len(out) == 200  # 0% vs 100%
    out2 = stratified_sample(
        ds, id_col="id", stratum_col="s", rates_pct={}, default_pct=25
    ).to_pandas()
    want = {i for i in range(400) if md5_u64(str(i)) % 100 < 25}
    assert set(out2["id"]) == want  # decision = the documented md5 family


def test_exact_quantiles_matches_numpy_rank(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from webscraper_ray.functions.stats import exact_quantiles

    vals = np.repeat([10, 20, 30, 40], [7, 1, 1, 1])  # skewed counts
    ds = ray.data.from_arrow(pa.table({"x": vals})).repartition(3)
    out = exact_quantiles(ds, "x", [0.5, 0.7, 0.9, 1.0]).to_pandas()
    s = np.sort(vals)
    import math

    want = [int(s[max(1, math.ceil(q * len(s))) - 1]) for q in (0.5, 0.7, 0.9, 1.0)]
    assert out["x"].tolist() == want


# --- clustering / vocabulary -------------------------------------------------


def test_exact_quantiles_high_cardinality_guard(ray_session):
    """VERDICT r3 #4: a float column with cardinality ~ row count must
    fail loudly before the driver gather, not OOM; bounded columns pass
    untouched under the same explicit limit."""
    import numpy as np
    import pyarrow as pa
    import pytest
    import ray.data

    from webscraper_ray.functions.stats import (
        exact_quantiles,
        exact_quantiles_by_group,
    )

    n = 5000
    rng = np.random.default_rng(3)
    t = pa.table(
        {
            "g": pa.array((np.arange(n) % 3).astype(str)),
            "score": pa.array(rng.uniform(0, 1, n), pa.float64()),
            "length": pa.array((np.arange(n) % 17).astype(np.int64)),
        }
    )
    ds = ray.data.from_arrow(t)
    with pytest.raises(Exception, match="distinct values"):
        exact_quantiles(ds, "score", [0.5], max_distinct=1000)
    with pytest.raises(Exception, match="distinct values"):
        exact_quantiles_by_group(ds, "g", "score", [0.5], max_distinct=1000)
    # the bounded column still works under the same limit
    out = exact_quantiles(ray.data.from_arrow(t), "length", [0.5], max_distinct=1000)
    assert out.num_rows == 1


def test_round_half_away_matches_duckdb():
    import duckdb
    import numpy as np

    from webscraper_ray.functions.clustering import round_half_away

    vals = [0.5, 1.5, 2.5, -0.5, -1.5, -2.5, 2.4999, -2.4999, 1e6 + 0.5]
    got = round_half_away(np.array(vals)).tolist()
    want = [
        duckdb.sql(f"SELECT round(CAST({v} AS DOUBLE))").fetchone()[0]
        for v in vals
    ]
    assert got == want


def test_kmeans_deterministic_across_block_counts(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from webscraper_ray.functions.clustering import kmeans_clusters

    rng = np.random.default_rng(3)
    n, d = 300, 8
    x = rng.normal(size=(n, d)).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(list(x), pa.list_(pa.float32())),
        }
    )
    outs = []
    for blocks in (1, 7):
        ds = ray.data.from_arrow(t).repartition(blocks)
        out = (
            kmeans_clusters(ds, k=3, iters=2)
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        outs.append(out)
    assert outs[0].equals(outs[1])  # int-exact math: parallelism-invariant
    assert outs[0]["cluster"].nunique() > 1


def test_kmeans_empty_cluster_keeps_centroid(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from webscraper_ray.functions.clustering import kmeans_clusters

    # two tight blobs, k=3: the third initial centroid (id 2, inside blob
    # A) empties after one update; the run must not crash and every blob
    # must stay pure
    a = np.zeros((10, 4), dtype=np.float32)
    b = np.full((10, 4), 5.0, dtype=np.float32)
    x = np.vstack([a, b]) + 0.01 * np.arange(20, dtype=np.float32)[:, None]
    t = pa.table(
        {
            "vec_id": pa.array(range(20), pa.int64()),
            "embedding": pa.array(list(x), pa.list_(pa.float32())),
        }
    )
    out = (
        kmeans_clusters(ray.data.from_arrow(t), k=3, iters=3)
        .to_pandas()
        .sort_values("vec_id")
    )
    blob_a = set(out["cluster"][:10])
    blob_b = set(out["cluster"][10:])
    assert blob_a.isdisjoint(blob_b)


def test_vocab_top_tokens_tie_order(ray_session):
    import pyarrow as pa
    import ray.data

    from webscraper_ray.functions.textstats import vocab_top_tokens

    docs = ["b a", "a c b", "  ", "c"]
    ds = ray.data.from_arrow(pa.table({"text": docs})).repartition(2)
    out = vocab_top_tokens(ds, k=2).to_pandas()
    # freqs: a=2 b=2 c=2 -> ties break token-ascending -> a, b
    assert out["token"].tolist() == ["a", "b"]
    assert out["freq"].tolist() == [2, 2]


def test_range_count_join_giant_key_single_partition(ray_session):
    """Documented assumption: one giant key lands in ONE partition (as in
    any hash join) — the merge must stay correct and bounded there."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from webscraper_ray.functions.joins import range_count_join

    us = pa.timestamp("us")
    n = 20_000  # one hot key holds every right row
    left = _mk_ds(
        {"eid": [1, 2], "k": [7, 7], "ts": [1_000_000, 2_000_000]},
        pa.schema([("eid", pa.int64()), ("k", pa.int64()), ("ts", us)]),
    )
    right = _mk_ds(
        {"k": [7] * n, "rts": list(range(n))},
        pa.schema([("k", pa.int64()), ("rts", us)]),
    )
    out = (
        range_count_join(
            left,
            right,
            left_key="k",
            left_ts="ts",
            right_key="k",
            right_ts="rts",
            lo_offset_us=-1_000_000,
            hi_offset_us=0,
            count_as="n",
        )
        .to_pandas()
        .sort_values("eid")
    )
    # eid=1 window [0, 1e6) -> rts 0..19999 all inside -> 20000... wait,
    # rts < 1e6 and rts >= 0: all n rows qualify for eid=1; for eid=2
    # window [1e6, 2e6): none qualify
    assert out["n"].tolist() == [n, 0]


def test_asof_join_giant_key_single_partition(ray_session):
    """VERDICT r3 #6 (documented hash-join caveat): one key holding every
    right row lands in ONE merge partition — the merge must degrade
    gracefully (one vectorized searchsorted pass, correct output), not
    blow up. 40k right rows on a single key, many distinct timestamps."""
    import pyarrow as pa

    from webscraper_ray.functions.joins import asof_join

    us = pa.timestamp("us")
    n = 40_000
    left = _mk_ds(
        {"eid": [1, 2, 3], "k": [7, 7, 7], "ts": [500, 25_000, n + 10]},
        pa.schema([("eid", pa.int64()), ("k", pa.int64()), ("ts", us)]),
    )
    right = _mk_ds(
        {"k": [7] * n, "rts": list(range(n)), "val": list(range(n))},
        pa.schema([("k", pa.int64()), ("rts", us), ("val", pa.int64())]),
    )
    out = (
        asof_join(
            left,
            right,
            left_key="k",
            left_ts="ts",
            right_key="k",
            right_ts="rts",
            right_payload=["val"],
        )
        .to_pandas()
        .sort_values("eid")
    )
    # latest rts <= ts: 500 -> 500, 25_000 -> 25_000, n+10 -> n-1
    assert out["val"].tolist() == [500, 25_000, n - 1]


def test_asof_join_payload_collision_rejected(ray_session):
    import pyarrow as pa
    import pytest

    from webscraper_ray.functions.joins import asof_join

    us = pa.timestamp("us")
    left = _mk_ds(
        {"eid": [1], "k": [1], "ts": [100]},
        pa.schema([("eid", pa.int64()), ("k", pa.int64()), ("ts", us)]),
    )
    right = _mk_ds(
        {"k": [1], "rts": [50], "eid": [9]},
        pa.schema([("k", pa.int64()), ("rts", us), ("eid", pa.int64())]),
    )
    with pytest.raises(ValueError, match="collide"):
        asof_join(
            left,
            right,
            left_key="k",
            left_ts="ts",
            right_key="k",
            right_ts="rts",
            right_payload=["eid"],
        )


def test_topk_per_group_string_key(ray_session):
    import pyarrow as pa
    import ray.data

    from webscraper_ray.functions.ranking import topk_per_group

    t = pa.table(
        {
            "src": ["a", "a", "b", "b", "b"],
            "score": [1.0, 3.0, 2.0, 5.0, 4.0],
            "tid": [1, 2, 3, 4, 5],
        }
    )
    out = (
        topk_per_group(
            ray.data.from_arrow(t).repartition(2),
            key="src",
            order_col="score",
            tie_col="tid",
            k=1,
        )
        .to_pandas()
        .sort_values("src")
    )
    assert out["tid"].tolist() == [2, 4]


def test_ann_ivf_recall_and_self_hit(ray_session):
    import ray.data

    from webscraper_ray.functions.ann import ann_bruteforce_topk, ann_ivf_topk

    rng = np.random.default_rng(11)
    mat = rng.standard_normal((300, 16)).astype(np.float64)
    rows = [{"vec_id": i, "embedding": mat[i].tolist()} for i in range(300)]
    ds = ray.data.from_items(rows)
    qids, qmat = [0, 1], mat[:2]
    exact = ann_bruteforce_topk(ds, qids, qmat, k=5).to_pandas()
    ivf = ann_ivf_topk(
        ray.data.from_items(rows), qids, qmat, k=5, n_clusters=4, iters=2, nprobe=2
    ).to_pandas()
    for q in qids:
        # the query's own list is always probed -> the self-hit survives
        got = ivf[ivf.query_id == q]
        assert (got.vec_id == q).any()
        assert got.cos_sim.max() == 1.0
    inter = len(
        set(map(tuple, exact[["query_id", "vec_id"]].values))
        & set(map(tuple, ivf[["query_id", "vec_id"]].values))
    )
    assert inter >= 2  # at minimum the self-hits; typically most of top-5


def test_exact_quantiles_by_group(ray_session):
    import math

    import numpy as np
    import pyarrow as pa
    import ray.data

    from webscraper_ray.functions.stats import exact_quantiles_by_group

    t = pa.table(
        {
            "g": ["a"] * 10 + ["b"] * 4,
            "x": list(range(10)) + [100, 100, 200, 300],
        }
    )
    out = (
        exact_quantiles_by_group(
            ray.data.from_arrow(t).repartition(3), "g", "x", [0.5, 1.0]
        )
        .to_pandas()
        .sort_values(["g", "q"])
        .reset_index(drop=True)
    )
    def disc(vals, q):
        s = sorted(vals)
        return s[max(1, math.ceil(q * len(s))) - 1]
    assert out.values.tolist() == [
        ["a", 0.5, disc(range(10), 0.5)],
        ["a", 1.0, 9],
        ["b", 0.5, 100],
        ["b", 1.0, 300],
    ]


def test_asof_join_string_key(ray_session):
    """_part_column routes string keys through the md5 hash; the merge
    must factorize them to int codes, not crash on key*m arithmetic."""
    import pyarrow as pa

    from webscraper_ray.functions.joins import asof_join

    us = pa.timestamp("us")
    left = _mk_ds(
        {"eid": [1, 2, 3], "host": ["a.com", "b.org", "a.com"],
         "ts": [1_000, 2_000, 50]},
        pa.schema([("eid", pa.int64()), ("host", pa.string()), ("ts", us)]),
    )
    right = _mk_ds(
        {"host": ["a.com", "b.org", "c.net"], "rts": [500, 1_500, 10],
         "oid": [10, 11, 12]},
        pa.schema([("host", pa.string()), ("rts", us), ("oid", pa.int64())]),
    )
    out = (
        asof_join(
            left, right,
            left_key="host", left_ts="ts",
            right_key="host", right_ts="rts",
            right_payload=["oid"],
        )
        .to_pandas()
        .sort_values("eid")
    )
    # eid=1 (a.com, 1000) -> oid 10; eid=2 (b.org, 2000) -> oid 11;
    # eid=3 (a.com, 50): nothing at or before -> dropped (inner)
    assert out["eid"].tolist() == [1, 2]
    assert out["oid"].tolist() == [10, 11]


def test_range_count_join_string_key(ray_session):
    import pyarrow as pa

    from webscraper_ray.functions.joins import range_count_join

    us = pa.timestamp("us")
    left = _mk_ds(
        {"eid": [1, 2], "host": ["a.com", "zz.io"], "ts": [1_000, 1_000]},
        pa.schema([("eid", pa.int64()), ("host", pa.string()), ("ts", us)]),
    )
    right = _mk_ds(
        {"host": ["a.com", "a.com", "zz.io"], "rts": [1_100, 5_000, 900],
         "oid": [1, 2, 3]},
        pa.schema([("host", pa.string()), ("rts", us), ("oid", pa.int64())]),
    )
    out = (
        range_count_join(
            left, right,
            left_key="host", left_ts="ts",
            right_key="host", right_ts="rts",
            lo_offset_us=0, hi_offset_us=2_000,
        )
        .to_pandas()
        .sort_values("eid")
    )
    assert out["eid"].tolist() == [1, 2]
    assert out["n_matches"].tolist() == [1, 0]


def test_batch_topk_tied_scores_keep_lowest_ids():
    """Exact-duplicate embeddings tie at the k-th slot: the block-level
    partial must keep the k lowest vec_ids among ties (the oracle's
    ORDER BY cos_sim DESC, vec_id), not argpartition's arbitrary pick."""
    import numpy as np
    import pyarrow as pa

    from webscraper_ray.functions.ann import _BatchTopK

    vec = [1.0, 0.0, 0.0]
    batch = pa.table(
        {
            "vec_id": pa.array([9, 5, 1, 7, 3], pa.int64()),
            "embedding": pa.array([vec] * 5, pa.list_(pa.float64())),
        }
    )
    out = _BatchTopK(([42], np.array([vec])), k=2)(batch)
    assert sorted(out.column("vec_id").to_pylist()) == [1, 3]


def test_topk_rows_argpartition_matches_full_lexsort():
    """_topk_rows selects with O(n) argpartition + a boundary lexsort;
    the result must equal the full lexsort on the (round(score,6) DESC,
    id ASC) contract — including ties AT the k-th slot and scores that
    differ only past 6 decimals (rounded equal -> id decides)."""
    import numpy as np

    from webscraper_ray.functions.ann import _topk_rows

    rng = np.random.default_rng(7)
    for trial in range(20):
        n = int(rng.integers(5, 200))
        # coarse grid: lots of exact ties; plus sub-1e-6 jitter that the
        # round(., 6) contract must erase
        scores = rng.integers(0, 8, n) / 10.0 + rng.uniform(-4e-8, 4e-8, n)
        ids = rng.permutation(n).astype(np.int64)
        k = int(rng.integers(1, n + 1))
        got = _topk_rows(scores, ids, k)
        if k >= n:
            # fast path: all rows, order irrelevant (final reduce sorts)
            assert sorted(got) == list(range(n)), (trial, n, k)
        else:
            want = np.lexsort((ids, -np.round(scores, 6)))[:k]
            assert np.array_equal(got, want), (trial, n, k)


def test_embedding_matrix_zero_copy_decode_handles_slices():
    """The shared Arrow list decode must read child values (flatten),
    so a SLICED list array — nonzero offset, where `.values` would leak
    neighboring rows — still decodes the right matrix."""
    import numpy as np
    import pyarrow as pa

    from webscraper_ray.functions.ann import _embedding_matrix

    rows = [[float(i), float(i) + 0.5] for i in range(6)]
    arr = pa.array(rows, pa.list_(pa.float64()))
    full = _embedding_matrix(arr)
    assert full.shape == (6, 2) and full.dtype == np.float64
    assert np.array_equal(full, np.asarray(rows))
    sliced = arr.slice(2, 3)
    got = _embedding_matrix(sliced)
    assert np.array_equal(got, np.asarray(rows[2:5]))
    chunked = pa.chunked_array([arr.slice(0, 2), arr.slice(4, 2)])
    got2 = _embedding_matrix(chunked)
    assert np.array_equal(got2, np.asarray(rows[:2] + rows[4:]))
    assert _embedding_matrix(pa.array([], pa.list_(pa.float64()))).size == 0


def test_ann_ivf_empty_corpus(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from webscraper_ray.functions.ann import ann_ivf_topk

    empty = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array([], pa.int64()),
                "embedding": pa.array([], pa.list_(pa.float64())),
            }
        )
    )
    out = ann_ivf_topk(empty, [1], np.array([[1.0, 0.0]]), k=3)
    assert out.count() == 0


def test_repetition_stats_edges():
    import pyarrow as pa

    from webscraper_ray.functions.textstats import repetition_stats

    batch = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                [
                    "",  # empty -> zeros
                    "lonely",  # single token -> zeros
                    "a b a b a b",  # 'a b' x3, 'b a' x2 -> top 3/5
                    "x y z",  # all distinct -> top 1/2
                ],
                pa.string(),
            ),
        }
    )
    out = repetition_stats(batch)
    assert out.column("n_bigrams").to_pylist() == [0, 0, 5, 2]
    assert out.column("top_bigram_count").to_pylist() == [0, 0, 3, 1]
    assert out.column("top_bigram_frac").to_pylist() == [0.0, 0.0, 0.6, 0.5]


def test_contamination_check_counts_distinct_ngrams(ray_session):
    import pyarrow as pa
    import ray
    import ray.data

    from webscraper_ray.functions.textstats import (
        benchmark_ngram_set,
        contamination_check,
    )

    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(
                    [
                        "the quick brown fox jumps",  # benchmark doc
                        "a quick brown fox appears",  # shares 'quick brown fox'
                        "nothing in common here at all",
                    ],
                    pa.string(),
                ),
            }
        )
    )
    bench = docs.filter(lambda r: r["doc_id"] == 1)
    ref = ray.put(benchmark_ngram_set(bench, n=3))
    out = (
        contamination_check(docs, ref, n=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # doc 1 self-hits all 3 of its 3-grams; doc 2 shares exactly one
    assert out["n_contaminated_ngrams"].tolist() == [3, 1, 0]
    assert out["contaminated"].tolist() == [True, True, False]


def test_bigram_lm_coverage_counts_occurrences(ray_session):
    import pyarrow as pa
    import ray
    import ray.data

    from webscraper_ray.functions.textstats import (
        bigram_lm_coverage,
        top_bigrams,
    )

    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(
                    [
                        "a b a b a b",  # bigrams: 'a b' x3, 'b a' x2
                        "a b c d",  # 'a b' 'b c' 'c d'
                        "",  # zeros
                    ],
                    pa.string(),
                ),
            }
        )
    )
    lm_tbl = top_bigrams(docs, k=2)  # 'a b' (4) and 'b a' (2): ties none
    lm = frozenset(
        v
        for b in lm_tbl.iter_batches(batch_format="pyarrow")
        for v in b.column("bigram").to_pylist()
    )
    assert lm == {"a b", "b a"}
    out = (
        bigram_lm_coverage(docs, ray.put(lm))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # doc 1: all 5 occurrences covered; doc 2: only 'a b' of 3; doc 3: zeros
    assert out["n_bigrams"].tolist() == [5, 3, 0]
    assert out["n_in_lm"].tolist() == [5, 1, 0]
    assert out["lm_coverage"].tolist() == [1.0, 0.333333, 0.0]


def test_pack_sequences_parallelism_invariant(ray_session):
    """The distributed prefix sum must produce the same layout
    regardless of block structure, and bucket boundaries must chain
    offsets exactly."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from webscraper_ray.functions.packing import pack_sequences

    # 50 docs spread over many small buckets (bucket_size=8)
    ids = list(range(0, 100, 2))
    texts = ["w " * (i % 7 + 1) for i in ids]  # 1..7 tokens each
    t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(texts, pa.string())})

    def run(nblocks):
        out = (
            pack_sequences(
                ray.data.from_arrow(t).repartition(nblocks),
                context_len=10, bucket_size=8,
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        return out

    a, b = run(1), run(7)
    assert a.equals(b)
    # exact serial reference
    toks = np.array([i % 7 + 1 for i in ids])
    excl = np.concatenate([[0], np.cumsum(toks)[:-1]])
    assert a["global_offset"].tolist() == excl.tolist()
    assert a["seq_id"].tolist() == (excl // 10).tolist()
    assert a["offset_in_seq"].tolist() == (excl % 10).tolist()


def test_pack_sequences_rejects_duplicate_doc_ids(ray_session):
    """A duplicated doc_id makes the layout ill-posed (tokens would be
    double-counted in the bucket offsets) — it must raise loudly, not
    emit garbage (ADVICE r3)."""
    import pyarrow as pa
    import pytest
    import ray.data

    from webscraper_ray.functions.packing import pack_sequences

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 2, 3], pa.int64()),
            "text": pa.array(["a b", "c", "d e f", "g"], pa.string()),
        }
    )
    with pytest.raises(Exception, match="unique doc_id.*duplicate id 2"):
        pack_sequences(ray.data.from_arrow(t), context_len=4).to_pandas()


def test_multiprobe_recall_superset_of_single_probe(ray_session, tmp_path):
    """Multi-probe scores a superset of buckets, so per-query recall vs
    brute force is >= the single-probe index probe's — and its result
    must match a direct superset-probe recompute."""
    import ray.data

    from webscraper_ray.functions.ann import (
        ann_bruteforce_topk,
        ann_lsh_topk_indexed,
        ann_lsh_topk_multiprobe,
        build_ann_index,
    )

    rng = np.random.default_rng(23)
    n, dim, bits, k = 300, 16, 3, 10
    mat = rng.standard_normal((n, dim)).astype(np.float64)
    rows = [{"vec_id": i, "embedding": mat[i].tolist()} for i in range(n)]
    idx = str(tmp_path / "ann_mp_index")
    build_ann_index(ray.data.from_items(rows), idx, bits=bits)

    qids, qmat = [0, 1, 2, 3], mat[:4]
    truth = ann_bruteforce_topk(
        ray.data.from_items(rows), qids, qmat, k=k
    ).to_pandas()
    single = ann_lsh_topk_indexed(idx, qids, qmat, k=k, bits=bits).to_pandas()
    multi = ann_lsh_topk_multiprobe(idx, qids, qmat, k=k, bits=bits).to_pandas()

    def recall(got):
        r = 0.0
        for q in qids:
            t = set(truth[truth.query_id == q].vec_id)
            g = set(got[got.query_id == q].vec_id)
            r += len(t & g) / len(t)
        return r / len(qids)

    assert recall(multi) >= recall(single)
    assert recall(multi) > 0.5  # bits+1 probes of 8 buckets: real recall
    # every multiprobe hit must be at least as good as the single-probe
    # hit set it extends (superset probe => superset candidates)
    for q in qids:
        s = set(single[single.query_id == q].vec_id)
        m = set(multi[multi.query_id == q].vec_id)
        smin = single[single.query_id == q].cos_sim.min() if len(s) else -2
        assert len(m) >= len(s)
        assert multi[multi.query_id == q].cos_sim.min() >= smin or len(s) < 10


def test_hll_grouped_registers_merge_and_accuracy(ray_session):
    """Grouped HLL: registers must equal the per-group single-dataset
    sketch at any parallelism, and estimates stay within 3 sigma."""
    import math

    import ray.data

    from webscraper_ray.functions.sketches import (
        M_REGISTERS,
        hll_estimate,
        hll_registers_by_group,
    )

    rng = np.random.default_rng(4)
    groups, vals = [], []
    true = {"a": 400, "b": 50}
    for g, n in true.items():
        ids = rng.choice(100000, n, replace=False)
        for v in ids:
            for _ in range(2):  # duplicates must not matter
                groups.append(g)
                vals.append(int(v))
    tbl = pa.table(
        {"g": pa.array(groups), "v": pa.array(vals, pa.int64())}
    )
    outs = {}
    for blocks in (1, 9):
        ds = ray.data.from_arrow(tbl).repartition(blocks)
        out = hll_registers_by_group(ds, "g", "v").to_pandas()
        outs[blocks] = out.sort_values(["g", "register"]).reset_index(drop=True)
    assert outs[1].equals(outs[9])
    for g, n in true.items():
        regs = {
            int(r.register): int(r.rho)
            for r in outs[1][outs[1].g == g].itertuples()
        }
        est = hll_estimate(regs)
        sigma = 1.04 / math.sqrt(M_REGISTERS) * n
        assert abs(est - n) <= 3 * sigma, (g, est, n)
