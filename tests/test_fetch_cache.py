"""FetchCache / frontier-shard unit tests for the round-3 fixes:

- zero-row buckets serve empty results instead of IndexError (ADVICE r2)
- duplicate url rows resolve LAST-wins like the dict index they replaced
- bucket column shipped by the frontier shards -> vectorized cache filter
  gives identical fetches to the hash-everything fallback
- known-missing fast path is gated on static_store: a network fetcher's
  transient miss must be re-fetched on retry (ADVICE r2, medium)
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray

from webscraper_ray.stages.fetch import FetchCache, bucket_of
from webscraper_ray.state.frontier import FrontierShard


def _write_bucket(root: str, bucket: int, tables: list[pa.Table]) -> str:
    d = os.path.join(root, f"bucket={bucket}")
    os.makedirs(d, exist_ok=True)
    for i, t in enumerate(tables):
        pq.write_table(t, os.path.join(d, f"part-{i}.parquet"))
    return d


def _pages(urls: list[str], htmls: list[str]) -> pa.Table:
    return pa.table(
        {"url": pa.array(urls, pa.string()), "html": pa.array(htmls, pa.large_string())}
    )


def test_empty_bucket_returns_empty(ray_session, tmp_path):
    root = str(tmp_path / "store")
    d = _write_bucket(root, 0, [_pages([], [])])
    cache = FetchCache.remote()
    out = ray.get(cache.fetch.remote(d, ["http://a.test/x"], [0], [0]))
    assert out.num_rows == 0
    assert set(out.column_names) == {"url", "html", "depth", "priority"}
    ray.kill(cache)


def test_duplicate_url_rows_last_wins(ray_session, tmp_path):
    root = str(tmp_path / "store")
    # two files: the LATER file's row must win (re-crawled page appended)
    d = _write_bucket(
        root,
        0,
        [
            _pages(["http://a.test/x", "http://a.test/y"], ["old-x", "y"]),
            _pages(["http://a.test/x"], ["new-x"]),
        ],
    )
    cache = FetchCache.remote()
    out = ray.get(
        cache.fetch.remote(d, ["http://a.test/x", "http://a.test/y"], [1, 2], [3, 4])
    )
    got = dict(zip(out.column("url").to_pylist(), out.column("html").to_pylist()))
    assert got == {"http://a.test/x": "new-x", "http://a.test/y": "y"}
    ray.kill(cache)


def test_bucket_column_path_matches_hash_fallback(ray_session, tmp_path):
    root = str(tmp_path / "store")
    n_buckets, pool = 4, 2
    urls = [f"http://h{i}.test/p{i}" for i in range(24)]
    by_bucket: dict[int, list[str]] = {}
    for u in urls:
        by_bucket.setdefault(bucket_of(u, n_buckets), []).append(u)
    for b, us in by_bucket.items():
        _write_bucket(root, b, [_pages(us, [f"<html>{u}</html>" for u in us])])

    admitted = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "depth": pa.array([1] * len(urls), pa.int32()),
            "priority": pa.array([0] * len(urls), pa.int32()),
        }
    )
    with_bucket = admitted.append_column(
        "bucket", pa.array([bucket_of(u, n_buckets) for u in urls], pa.int32())
    )
    caches = [FetchCache.remote() for _ in range(pool)]
    for my_idx in range(pool):
        fast = ray.get(
            caches[my_idx].fetch_from_tables.remote(
                root, n_buckets, pool, my_idx, with_bucket
            )
        )
        slow = ray.get(
            caches[my_idx].fetch_from_tables.remote(
                root, n_buckets, pool, my_idx, admitted
            )
        )
        assert sorted(fast.column("url").to_pylist()) == sorted(
            slow.column("url").to_pylist()
        )
        assert fast.num_rows == slow.num_rows > 0
    for c in caches:
        ray.kill(c)


@pytest.mark.parametrize("static_store", [True, False])
def test_known_missing_gated_on_static_store(ray_session, static_store):
    shard = FrontierShard.remote(
        0, {}, None, static_store=static_store, fetch_buckets=0
    )
    ray.get(shard.offer_batch.remote([("https://example.com/a", 0, 0)]))
    res = ray.get(shard.stage_and_admit_all.remote(False))
    assert res["count"] == 1 and res["ref"] is not None
    # no status reported for the URL -> fetch miss
    finish = ray.get(shard.finish_wave.remote())
    assert finish["failures"] == 1
    res2 = ray.get(shard.stage_and_admit_all.remote(False))
    assert res2["count"] == 1
    if static_store:
        # static page store: the miss is remembered and skips the pipeline
        assert res2["skipped_missing"] == 1 and res2["ref"] is None
    else:
        # network fetcher: transient miss MUST be re-fetched on retry
        assert res2["skipped_missing"] == 0 and res2["ref"] is not None
        table = ray.get(res2["ref"])
        assert table.column("url").to_pylist() == ["https://example.com/a"]
    ray.kill(shard)


def test_wave_dataset_streams_refs_without_barrier(ray_session):
    """wave_dataset builds a Dataset over IN-FLIGHT refs: construction
    must not block on slow producers (no from_arrow_refs metadata
    barrier), and consuming it yields exactly the refs' rows."""
    import time

    from webscraper_ray.stages.fetch import wave_dataset

    @ray.remote
    def slow_block(i: int, delay: float) -> pa.Table:
        time.sleep(delay)
        return pa.table({"url": [f"u{i}"], "n": [i]})

    refs = [slow_block.remote(i, 5.0 if i == 0 else 0.0) for i in range(4)]
    t0 = time.time()
    ds = wave_dataset(refs)
    construct_s = time.time() - t0
    # construction must return while block 0 still sleeps (read planning
    # has ~1 s cold-start overhead in a fresh session, but never a
    # barrier on the refs the way from_arrow_refs' metadata ray.get is)
    assert construct_s < 2.5
    out = ds.take_all()
    assert sorted(r["n"] for r in out) == [0, 1, 2, 3]


def test_fetch_refs_interleaved_across_actors(ray_session, tmp_path):
    """fetch_refs_from_tables returns refs round-robin across the cache
    pool so the streaming read's first tasks hit distinct actors."""
    from webscraper_ray.stages.fetch import PageStore, SandboxFetcher

    n_buckets = 4
    urls = [f"https://h{i}.test/p{i}" for i in range(32)]
    root = str(tmp_path / "pages")
    for b in range(n_buckets):
        os.makedirs(os.path.join(root, f"bucket={b}"), exist_ok=True)
    rows = {b: [] for b in range(n_buckets)}
    for u in urls:
        rows[bucket_of(u, n_buckets)].append(u)
    for b, us in rows.items():
        pq.write_table(
            pa.table(
                {
                    "url": pa.array(us, pa.string()),
                    "html": pa.array(["<html></html>"] * len(us), pa.large_string()),
                }
            ),
            os.path.join(root, f"bucket={b}", "part-0.parquet"),
        )
    store = PageStore(root, n_buckets)
    fetcher = SandboxFetcher(store, pool_size=2)
    admitted = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "depth": pa.array([0] * len(urls), pa.int32()),
            "priority": pa.array([0] * len(urls), pa.int32()),
        }
    )
    refs = fetcher.fetch_refs_from_tables([ray.put(admitted)])
    tables = ray.get(refs)
    got = sorted(
        u for t in tables if t.num_rows for u in t.column("url").to_pylist()
    )
    assert got == sorted(urls)
    # interleave property: with a 2-actor pool, consecutive refs come
    # from different actors, so consecutive non-empty blocks alternate
    # bucket parity (bucket % pool == actor index)
    parities = [
        bucket_of(t.column("url")[0].as_py(), n_buckets) % 2
        for t in tables
        if t.num_rows
    ]
    assert 0 in parities and 1 in parities
    first_two = parities[:2]
    assert first_two[0] != first_two[1]
    fetcher.shutdown()
