"""Fetch stage: bucketized page store + per-wave fetch join (SURVEY.md J4).

The reference fetches one URL from the network per request
(``src/crawler.ts:17-110``). In this sandbox the network is replaced by a
Parquet table of pages; "fetching" a wave of admitted URLs is a hash join
of a SMALL side (the wave) against a HUGE side (the pages table).

Scale design (100 TB pages, waves of 1e5-1e7 URLs):
- The pages table is stored ONCE, hash-bucketized by canonical URL into
  ``bucket=K/`` directories (``n_buckets`` chosen so one bucket ≈ a few
  hundred MB). This pays one full pass at ingest.
- Per wave we read ONLY the buckets containing admitted URLs
  (``read_parquet`` on the explicit bucket dirs — partition pruning with
  zero scan of untouched buckets) with column pruning to (url, html), and
  semi-join via a BROADCAST of the admitted-URL hash set (``ray.put`` once
  per wave, read per task) inside ``map_batches`` — no all-to-all shuffle
  (the wave side is always the small side).
- Fetch-misses (admitted URL absent from the store = transport error in
  the reference, ``src/crawler.ts:87-96``) are computed driver-side as
  ``wave_set − fetched_set`` and re-enqueued with retry+1.

A real network fetcher is a drop-in: replace ``fetch_wave`` with a
``map_batches(AsyncFetcher, concurrency=N)`` over the admitted-URL
dataset; everything downstream (extract, route, write) is unchanged
(SURVEY.md §7 hard part 6).
"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

__all__ = ["bucket_of", "bucket_of_many", "PageStore", "fetch_wave"]


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


# Worker-global cache of broadcast wave maps: one ray.get per worker
# process per wave (the broadcast-small-side pattern for TASK-based
# stages — actor pools would reserve CPUs for the whole wave and can
# deadlock short per-wave pipelines on small machines).
_WAVE_CACHE: dict[bytes, dict] = {}


def _get_wave_map(wave_ref) -> dict:
    key = wave_ref.binary()
    cached = _WAVE_CACHE.get(key)
    if cached is None:
        _WAVE_CACHE.clear()  # only one wave is live at a time
        cached = _WAVE_CACHE[key] = ray.get(wave_ref)
    return cached


def _semi_join_batch(batch: pa.Table, wave_ref) -> pa.Table:
    """Keep page rows whose url is in the broadcast wave set; attach wave
    metadata columns (depth, priority) for downstream stages."""
    wave = _get_wave_map(wave_ref)
    mask = pc.is_in(batch.column("url"), value_set=pa.array(list(wave), pa.string()))
    filtered = batch.filter(mask)
    kept = filtered.column("url").to_pylist()
    filtered = filtered.append_column(
        "depth", pa.array([wave[u][0] for u in kept], pa.int32())
    )
    return filtered.append_column(
        "priority", pa.array([wave[u][1] for u in kept], pa.int32())
    )


def fetch_wave(
    store: PageStore,
    wave_entries: list,
    *,
    batch_size: int = 64,
) -> "ray.data.Dataset | None":
    """Dataset of fetched pages (url, html, depth, priority) for a wave.

    ``wave_entries``: FrontierEntry list. Returns None when no bucket of
    the store contains any admitted URL (all fetch-miss). Task-based
    stage: elastic, no actor-pool CPU reservation.
    """
    wave_map = {e.canon_url: (e.depth, e.priority) for e in wave_entries}
    buckets = {bucket_of(u, store.n_buckets) for u in wave_map}
    files = store.existing_bucket_files(buckets)
    if not files:
        return None
    wave_ref = ray.put(wave_map)
    ds = ray.data.read_parquet(files, columns=["url", "html"])
    return ds.map_batches(
        _semi_join_batch,
        fn_kwargs={"wave_ref": wave_ref},
        batch_format="pyarrow",
        batch_size=batch_size,
    )
