"""Fetch layer: bucketized page store + sharded in-memory fetch cache
(SURVEY.md J4).

The reference fetches one URL from the network per request
(``src/crawler.ts:17-110``). In this sandbox the network is replaced by a
Parquet table of pages; "fetching" a wave of admitted URLs must touch
ONLY those rows — anything that rescans the store per wave is
O(corpus x waves) and was measurably the bottleneck of the first design.

Architecture (100 TB pages, waves of 1e5-1e7 URLs):
- The pages table is stored ONCE, hash-bucketized by canonical URL into
  ``bucket=K/`` dirs (one compacted file per bucket); this pays one
  all-to-all pass at ingest, amortized over every run.
- A pool of :class:`FetchCache` actors (bucket -> actor by
  ``bucket % pool``) holds each bucket's (url, html) table in memory with
  a url->row index and serves waves by Arrow ``take`` — point reads, no
  scan. Pool memory = corpus/pool per actor, the budget a per-node page
  cache would use; the pool scales with cluster size.
- Fetch-misses (admitted URL absent = transport error in the reference,
  ``src/crawler.ts:87-96``) are computed driver-side as
  ``wave_set − fetched_set`` and re-enqueued with retry+1.

A real network fetcher IS a drop-in: :class:`HttpFetcher` implements the
same ``fetch_wave_refs(entries) -> refs`` contract on a pool of
thread-pooled HTTP actors (loopback-server tested); everything
downstream (extract, route, write) is unchanged (SURVEY.md §7 hard
part 6).
"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa


import ray
import ray.data

__all__ = ["bucket_of", "bucket_of_many", "PageStore", "FetchCache", "SandboxFetcher", "HttpFetcher", "HttpFetchWorker", "fetch_wave"]


def bucket_of(canon_url: str, n_buckets: int) -> int:
    digest = hashlib.blake2b(canon_url.encode(), digest_size=8).digest()
    return int.from_bytes(digest, "little") % n_buckets


def bucket_of_many(urls: list[str], n_buckets: int) -> list[int]:
    return [bucket_of(u, n_buckets) for u in urls]


class PageStore:
    """Hash-bucketized Parquet page store under ``root/bucket=K/``."""

    def __init__(self, root: str, n_buckets: int):
        self.root = root
        self.n_buckets = n_buckets

    def bucket_dir(self, bucket: int) -> str:
        return os.path.join(self.root, f"bucket={bucket}")

    def existing_bucket_files(self, buckets: set[int]) -> list[str]:
        """Parquet files of the given buckets (read_parquet wants files
        when handed an explicit path list)."""
        files: list[str] = []
        for b in sorted(buckets):
            d = self.bucket_dir(b)
            if os.path.isdir(d):
                files.extend(
                    os.path.join(d, f)
                    for f in sorted(os.listdir(d))
                    if f.endswith(".parquet")
                )
        return files

    def compact(self) -> None:
        """Rewrite each bucket to ONE parquet file.

        Partitioned writes emit one file per (task, bucket) — thousands of
        tiny files whose per-file open cost dominates every wave's fetch
        read. One compacted file per bucket keeps reads at
        O(buckets-touched), the property the store exists for.
        """
        import pyarrow.parquet as pq

        @ray.remote
        def compact_bucket(bucket_dir: str) -> None:
            files = sorted(
                os.path.join(bucket_dir, f)
                for f in os.listdir(bucket_dir)
                if f.endswith(".parquet")
            )
            if len(files) <= 1:
                return
            table = pa.concat_tables(pq.read_table(f) for f in files)
            tmp = os.path.join(bucket_dir, "_compact.tmp")
            pq.write_table(table, tmp)
            for f in files:
                os.remove(f)
            os.replace(tmp, os.path.join(bucket_dir, "part-0.parquet"))

        dirs = [
            os.path.join(self.root, d)
            for d in os.listdir(self.root)
            if d.startswith("bucket=")
        ]
        ray.get([compact_bucket.remote(d) for d in dirs])

    @classmethod
    def build_from_parquet(
        cls, pages_parquet: str, root: str, n_buckets: int
    ) -> "PageStore":
        """One-time ingest: shuffle the pages table into URL-hash buckets.

        This IS an all-to-all exchange — paid once, amortized over every
        wave of every crawl run (the analog of loading a crawl store).
        """
        n = n_buckets

        def add_bucket(batch: pa.Table) -> pa.Table:
            buckets = bucket_of_many(batch.column("url").to_pylist(), n)
            return batch.append_column("bucket", pa.array(buckets, pa.int32()))

        (
            ray.data.read_parquet(pages_parquet)
            .map_batches(add_bucket, batch_format="pyarrow")
            .write_parquet(root, partition_cols=["bucket"])
        )
        return cls(root, n_buckets)


@ray.remote(num_cpus=0)
class FetchCache:
    """One shard of the in-memory page cache (the sandbox fetch layer).

    Each cache actor owns the buckets with ``bucket % pool_size == idx``
    and serves point fetches by row ``take`` on the cached Arrow table —
    the parquet analog of "fetch these URLs", touching ONLY the wave's
    rows instead of rescanning the store every wave (a full-store scan
    per wave is O(corpus x waves) — the mistake this class exists to
    avoid). Memory: corpus_bytes / pool_size per actor, the same budget a
    per-node page-cache shard would use on a real cluster; a real network
    fetcher (aiohttp actor pool) is a drop-in replacement with the same
    ``fetch(urls) -> Table`` contract.
    """

    def __init__(self) -> None:
        self._tables: dict[str, pa.Table] = {}

    def _load(self, bucket_dir: str) -> None:
        import pyarrow.parquet as pq

        files = sorted(
            os.path.join(bucket_dir, f)
            for f in os.listdir(bucket_dir)
            if f.endswith(".parquet")
        )
        table = pa.concat_tables(
            pq.read_table(f, columns=["url", "html"]) for f in files
        ).combine_chunks()
        if table.num_rows:
            import numpy as np
            import pyarrow.compute as pc

            urls = table.column("url")
            if pc.count_distinct(urls).as_py() != table.num_rows:
                # duplicate url rows (re-crawled page appended to the
                # bucket): keep the LAST occurrence — the dict index this
                # class replaced kept last-write-wins, and index_in would
                # silently resolve to the first. Reverse + keep first
                # occurrence per url == last in file order.
                n = table.num_rows
                table = table.take(pa.array(np.arange(n - 1, -1, -1))).combine_chunks()
                u = table.column("url")
                first = pc.index_in(u, value_set=u)
                keep = pc.equal(first.cast(pa.int64()), pa.array(np.arange(n)))
                table = table.filter(keep).combine_chunks()
        self._tables[bucket_dir] = table

    def preload(self, bucket_dirs: list[str]) -> int:
        for d in bucket_dirs:
            if d not in self._tables:
                self._load(d)
        return sum(t.num_rows for t in self._tables.values())

    def fetch(
        self, bucket_dir: str, urls: list[str], depths: list[int], priorities: list[int]
    ) -> pa.Table:
        """Rows for the requested urls (misses silently absent).

        Lookup is a vectorized ``pc.index_in`` against the cached url
        column (C++ hash join, no Python dict — a dict url->row index
        duplicated the whole url column in actor memory)."""
        import pyarrow.compute as pc

        if bucket_dir not in self._tables:
            self._load(bucket_dir)
        table = self._tables[bucket_dir]
        if table.num_rows == 0:
            return table.append_column(
                "depth", pa.array([], pa.int32())
            ).append_column("priority", pa.array([], pa.int32()))
        # value_set is the ChunkedArray itself (a 0-chunk combine_chunks
        # result has no .chunk(0); index_in accepts chunked input)
        wanted = pa.array(urls, pa.string())
        pos = pc.index_in(wanted, value_set=table.column("url"))
        hit = pc.is_valid(pos)
        rows = pc.filter(pos, hit)
        out = table.take(rows)
        keep = pa.table(
            {
                "depth": pa.array(depths, pa.int32()),
                "priority": pa.array(priorities, pa.int32()),
            }
        ).filter(hit)
        out = out.append_column("depth", keep.column("depth"))
        return out.append_column("priority", keep.column("priority"))

    def fetch_from_tables(
        self, root: str, n_buckets: int, pool_size: int, my_idx: int, *tables
    ) -> pa.Table:
        """Driverless wave fetch: consume the SHARDS' admitted-entry
        tables straight from the object store (the driver only routed
        refs), keep the rows owned by this cache shard
        (``bucket % pool == my_idx``) and point-take them per bucket."""
        import numpy as np

        out: list[pa.Table] = []
        for t in tables:
            if "bucket" in t.column_names:
                # frontier shards shipped each URL's store bucket with the
                # admitted table — filter vectorized instead of re-hashing
                # every URL in every one of the pool_size cache shards
                buckets = t.column("bucket").combine_chunks().to_numpy(
                    zero_copy_only=False
                )
                mine_rows = np.nonzero(buckets % pool_size == my_idx)[0]
                if not len(mine_rows):
                    continue
                mine_buckets = buckets[mine_rows]
                for b in np.unique(mine_buckets):
                    bucket_dir = os.path.join(root, f"bucket={int(b)}")
                    if not os.path.isdir(bucket_dir):
                        continue
                    sub = t.take(pa.array(mine_rows[mine_buckets == b]))
                    out.append(
                        self.fetch(
                            bucket_dir,
                            sub.column("url").to_pylist(),
                            sub.column("depth").to_pylist(),
                            sub.column("priority").to_pylist(),
                        )
                    )
                continue
            urls = t.column("url").to_pylist()
            depths = t.column("depth").to_pylist()
            prios = t.column("priority").to_pylist()
            mine: dict[int, list[int]] = {}
            for i, u in enumerate(urls):
                b = bucket_of(u, n_buckets)
                if b % pool_size == my_idx:
                    mine.setdefault(b, []).append(i)
            for b, idxs in mine.items():
                bucket_dir = os.path.join(root, f"bucket={b}")
                if not os.path.isdir(bucket_dir):
                    continue
                out.append(
                    self.fetch(
                        bucket_dir,
                        [urls[i] for i in idxs],
                        [depths[i] for i in idxs],
                        [prios[i] for i in idxs],
                    )
                )
        if not out:
            return pa.table(
                {
                    "url": pa.array([], pa.string()),
                    "html": pa.array([], pa.large_string()),
                    "depth": pa.array([], pa.int32()),
                    "priority": pa.array([], pa.int32()),
                }
            )
        return pa.concat_tables(out, promote_options="permissive")

    def fetch_from_tables_split(
        self,
        n_splits: int,
        root: str,
        n_buckets: int,
        pool_size: int,
        my_idx: int,
        *tables,
    ):
        """:meth:`fetch_from_tables` sliced into ``n_splits`` EQUAL-ROW
        blocks (call with ``.options(num_returns=n_splits)``).

        Hash-determined per-(cache,shard) block sizes vary ~2.5x, and the
        biggest block sets the wave's straggler tail — which amortizes at
        low parallelism but directly extends the wave when slots outnumber
        remaining tasks. Equal slices + more blocks per slot shrink that
        tail; pyarrow pickles a slice's rows only, so the split ships no
        extra bytes."""
        full = self.fetch_from_tables(root, n_buckets, pool_size, my_idx, *tables)
        if n_splits <= 1:
            return full
        n = full.num_rows
        bounds = [n * i // n_splits for i in range(n_splits + 1)]
        return tuple(
            full.slice(bounds[i], bounds[i + 1] - bounds[i])
            for i in range(n_splits)
        )


class SandboxFetcher:
    """Pool of FetchCache actors; bucket -> actor by ``bucket % pool``."""

    # capability flag read by run_crawl: a static store's miss can never
    # succeed on retry, so frontier shards may remember misses
    static_store = True

    def __init__(self, store: PageStore, pool_size: int = 8, cpu_share: float = 0.0):
        # cpu_share > 0 books the cache shards' point-take work inside
        # the session CPU budget (a real cluster's page-cache actors run
        # on the same nodes as the data stages); 0 keeps the test default
        self.store = store
        self.pool = [
            FetchCache.options(num_cpus=cpu_share).remote()
            for _ in range(pool_size)
        ]

    def prefetch(self) -> int:
        """Load every existing bucket into its cache shard, in parallel.

        The cold-load analog of a crawler's standing fetch infrastructure;
        call it before timing runs so wave 0 doesn't pay the one-time
        corpus load (it is amortized across runs in production)."""
        assign: dict[int, list[str]] = {}
        for b in range(self.store.n_buckets):
            d = self.store.bucket_dir(b)
            if os.path.isdir(d):
                assign.setdefault(b % len(self.pool), []).append(d)
        return sum(
            ray.get(
                [self.pool[i].preload.remote(dirs) for i, dirs in assign.items()]
            )
        )

    def fetch_wave_refs(self, wave_entries: list) -> list:
        by_bucket: dict[int, list] = {}
        for e in wave_entries:
            by_bucket.setdefault(bucket_of(e.canon_url, self.store.n_buckets), []).append(e)
        refs = []
        for b, entries in sorted(by_bucket.items()):
            bucket_dir = self.store.bucket_dir(b)
            if not os.path.isdir(bucket_dir):
                continue
            actor = self.pool[b % len(self.pool)]
            refs.append(
                actor.fetch.remote(
                    bucket_dir,
                    [e.canon_url for e in entries],
                    [e.depth for e in entries],
                    [e.priority for e in entries],
                )
            )
        return refs

    def fetch_refs_from_tables(self, table_refs: list) -> list:
        """Driverless wave flow: pass the frontier shards' admitted
        tables (ObjectRefs) to every cache shard; each filters to its own
        buckets. One call per (cache shard, frontier shard) pair so the
        wave lands as pool x shards medium blocks — a single block per
        cache shard would cap the downstream extract stage's task
        parallelism at pool_size. With more than ~8 task CPUs each call
        additionally returns EQUAL slices (num_returns) so block sizes
        are uniform and the wave's straggler tail stays a small fraction
        of a slot round. Driver cost: O(pool x shards x splits) refs,
        zero entries.

        The returned list is INTERLEAVED round-robin across the cache
        actors: the streaming read launches tasks in list order and each
        actor drains its call queue sequentially, so actor-major order
        would park the first wave of read tasks on actor 0's queue while
        the other actors sit idle."""
        if not table_refs:
            return []
        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        n_splits = max(1, round(cpus / 8))
        per_actor: list[list] = []
        for i in range(len(self.pool)):
            if n_splits == 1:
                per_actor.append(
                    [
                        self.pool[i].fetch_from_tables.remote(
                            self.store.root,
                            self.store.n_buckets,
                            len(self.pool),
                            i,
                            ref,
                        )
                        for ref in table_refs
                    ]
                )
                continue
            method = self.pool[i].fetch_from_tables_split.options(
                num_returns=n_splits
            )
            mine: list = []
            for ref in table_refs:
                mine.extend(
                    method.remote(
                        n_splits,
                        self.store.root,
                        self.store.n_buckets,
                        len(self.pool),
                        i,
                        ref,
                    )
                )
            per_actor.append(mine)
        refs = []
        for j in range(max(len(m) for m in per_actor)):
            for mine in per_actor:
                if j < len(mine):
                    refs.append(mine[j])
        return refs

    def fetch_refs_small(self, table_refs: list) -> list:
        """BFS-tail variant: ONE call per cache shard with ALL the
        shards' tables (pool blocks instead of pool x shards). A
        few-dozen-row wave gains nothing from 64-way block fan-out and
        pays every extra actor message as pure fixed cost."""
        if not table_refs:
            return []
        return [
            self.pool[i].fetch_from_tables.remote(
                self.store.root,
                self.store.n_buckets,
                len(self.pool),
                i,
                *table_refs,
            )
            for i in range(len(self.pool))
        ]

    def shutdown(self) -> None:
        for a in self.pool:
            ray.kill(a)
        self.pool = []


class WaveBlockDatasource(ray.data.Datasource):
    """Streams a wave's fetched blocks into a Dataset WITHOUT a driver
    barrier.

    ``ray.data.from_arrow_refs`` launches one metadata task per block ref
    and ``ray.get``s all of them before the Dataset even exists — the
    whole extract stage waits for the SLOWEST cache-shard slice, and the
    driver pays pool x shards x splits task round-trips per wave (a
    measured flat ~1-3 s/wave that does not shrink with CPUs). Here each
    in-flight actor-call ref becomes one ReadTask that ``ray.get``s only
    ITS block, so extraction of early blocks overlaps the cache shards
    still producing late ones and the driver launches the wave in O(1).
    Metadata is unknown up front (num_rows=None); the streaming executor
    fills it in as blocks land.
    """

    def __init__(self, refs: list):
        self._refs = list(refs)

    def estimate_inmemory_data_size(self):
        return None

    def get_read_tasks(self, parallelism: int) -> list:
        from ray.data.block import BlockMetadata
        from ray.data.datasource import ReadTask

        def make(ref):
            return ReadTask(
                lambda ref=ref: [ray.get(ref)],
                BlockMetadata(
                    num_rows=None,
                    size_bytes=None,
                    exec_stats=None,
                    input_files=None,
                ),
            )

        return [make(r) for r in self._refs]


def wave_dataset(data_refs: list) -> "ray.data.Dataset":
    """Dataset over a wave's in-flight fetch refs (one block per ref)."""
    return ray.data.read_datasource(
        WaveBlockDatasource(data_refs), override_num_blocks=len(data_refs)
    )


@ray.remote(num_cpus=0)
class HttpFetchWorker:
    """One network-fetch actor: a thread pool of blocking HTTP gets.

    The real-network analog of :class:`FetchCache` (reference fetch:
    ``src/crawler.ts:17-110`` — one crawlee HTTP get per URL, non-2xx and
    transport errors become retryable failures). Threads, not asyncio:
    the stdlib has no aiohttp here, and a thread pool of blocking
    ``urllib`` gets saturates a NIC just as well for crawl-sized pages.

    Misses (timeouts, non-2xx, connection errors) are silently absent
    from the returned table — the driver computes wave_set − fetched_set
    and requeues with retry+1, the same contract as the sandbox fetcher.
    """

    def __init__(self, max_threads: int = 16, timeout_s: float = 10.0,
                 user_agent: str = "webscraper-ray/2.0",
                 url_rewrite: "list[tuple[str, str]] | None" = None):
        from concurrent.futures import ThreadPoolExecutor

        self.pool = ThreadPoolExecutor(max_workers=max_threads)
        self.timeout_s = timeout_s
        self.user_agent = user_agent
        # mirror/proxy seam: (prefix, replacement) rules applied to the
        # REQUEST target only — the frontier's canonical URL is what the
        # output table (and thus the whole pipeline) keeps seeing. Lets a
        # crawl fetch through a mirror, a cache, or a loopback test
        # server without perturbing canon/politeness/seen state.
        self.url_rewrite = list(url_rewrite or [])

    def _get(self, url: str) -> str | None:
        import urllib.request

        for prefix, repl in self.url_rewrite:
            if url.startswith(prefix):
                url = repl + url[len(prefix):]
                break
        try:
            req = urllib.request.Request(url, headers={"User-Agent": self.user_agent})
            with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
                if not (200 <= resp.status < 300):
                    return None
                return resp.read().decode("utf-8", "replace")
        except Exception:  # noqa: BLE001 - any transport error is a miss
            return None

    def fetch(self, urls: list[str], depths: list[int], priorities: list[int]) -> pa.Table:
        bodies = list(self.pool.map(self._get, urls))
        keep = [i for i, b in enumerate(bodies) if b is not None]
        return pa.table(
            {
                "url": pa.array([urls[i] for i in keep], pa.string()),
                "html": pa.array([bodies[i] for i in keep], pa.large_string()),
                "depth": pa.array([depths[i] for i in keep], pa.int32()),
                "priority": pa.array([priorities[i] for i in keep], pa.int32()),
            }
        )

    def fetch_from_tables(self, pool_size: int, my_idx: int, *tables) -> pa.Table:
        """Driverless wave flow: fetch the rows whose host hashes to this
        worker from the shards' admitted tables (same host->worker
        assignment as HttpFetcher.fetch_wave_refs)."""
        from ..oracle.canon import host_of

        urls: list[str] = []
        depths: list[int] = []
        prios: list[int] = []
        for t in tables:
            for u, d, p in zip(
                t.column("url").to_pylist(),
                t.column("depth").to_pylist(),
                t.column("priority").to_pylist(),
            ):
                digest = hashlib.blake2b(host_of(u).encode(), digest_size=8).digest()
                if int.from_bytes(digest, "little") % pool_size == my_idx:
                    urls.append(u)
                    depths.append(d)
                    prios.append(p)
        return self.fetch(urls, depths, prios)


class HttpFetcher:
    """Drop-in network fetcher: same ``fetch_wave_refs(entries) -> refs``
    contract as :class:`SandboxFetcher`, so ``run_crawl(...,
    fetcher=HttpFetcher(...))`` crawls real HTTP endpoints with the
    frontier, politeness, extract, route and write stages unchanged.

    Entries are grouped BY HOST and hosts hash-assigned to workers, so a
    host's requests share one worker's connection pool (politeness
    budgets were already applied at admission)."""

    # network misses are transient: retries MUST re-fetch (see run_crawl)
    static_store = False

    def __init__(self, pool_size: int = 8, max_threads: int = 16,
                 timeout_s: float = 10.0,
                 url_rewrite: "list[tuple[str, str]] | None" = None):
        self.pool = [
            HttpFetchWorker.remote(
                max_threads=max_threads,
                timeout_s=timeout_s,
                url_rewrite=url_rewrite,
            )
            for _ in range(pool_size)
        ]

    def fetch_wave_refs(self, wave_entries: list) -> list:
        from ..oracle.canon import host_of

        by_worker: dict[int, list] = {}
        for e in wave_entries:
            h = host_of(e.canon_url)
            digest = hashlib.blake2b(h.encode(), digest_size=8).digest()
            w = int.from_bytes(digest, "little") % len(self.pool)
            by_worker.setdefault(w, []).append(e)
        return [
            self.pool[w].fetch.remote(
                [e.canon_url for e in entries],
                [e.depth for e in entries],
                [e.priority for e in entries],
            )
            for w, entries in sorted(by_worker.items())
        ]

    def fetch_refs_from_tables(self, table_refs: list) -> list:
        if not table_refs:
            return []
        return [
            self.pool[w].fetch_from_tables.remote(len(self.pool), w, ref)
            for w in range(len(self.pool))
            for ref in table_refs
        ]

    def fetch_refs_small(self, table_refs: list) -> list:
        """BFS-tail variant (same contract as SandboxFetcher): one call
        per worker with all the shards' tables."""
        if not table_refs:
            return []
        return [
            self.pool[w].fetch_from_tables.remote(len(self.pool), w, *table_refs)
            for w in range(len(self.pool))
        ]

    def shutdown(self) -> None:
        for a in self.pool:
            ray.kill(a)
        self.pool = []


def fetch_wave(
    store: PageStore,
    wave_entries: list,
    *,
    fetcher: "SandboxFetcher | HttpFetcher | None" = None,
) -> "ray.data.Dataset | None":
    """Dataset of fetched pages (url, html, depth, priority) for a wave.

    Point-fetches only the wave's rows through the sharded page cache;
    returns None when nothing could be fetched (all miss).
    """
    if not wave_entries:
        return None
    owns_fetcher = fetcher is None
    if owns_fetcher:
        fetcher = SandboxFetcher(store)
    refs = fetcher.fetch_wave_refs(wave_entries)
    if not refs:
        if owns_fetcher:
            fetcher.shutdown()
        return None
    # one block per touched bucket; downstream map_batches re-slices to
    # its own batch_size, so no extra stage is needed here
    return ray.data.from_arrow_refs(refs)
