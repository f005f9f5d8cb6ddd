"""The distributed crawl: BFS waves over a bucketized page store (M2/M3).

Re-architecture of the reference's per-request scrape loop (SURVEY.md
§3.1) as a Ray Data pipeline:

    seeds -> frontier shards (offer)
    wave k:  frontier.pop_wave(max_wave_size)    # politeness-ordered admission
          -> fetch_wave (sharded page-cache point fetch)             # J4
          -> map_batches(extract)                # E1-E15, zero-copy Arrow
          -> map_batches(route)                  # offers+status -> shards
          -> write_parquet(docs/wave=k/)         # S3 analog, partitioned
          (one fused dataset execution; wave status arrives via the
           shard actors, no second pass)
          -> requeue fetch-misses / dead-letter extraction failures
          -> checkpoint shards + manifest        # resume point

Scale properties: the only all-to-all exchange is the ONE-TIME page-store
bucketize; per wave everything is either point fetches, local batch
transforms, or host-routed actor messages. Output is partitioned by wave
(resumable: a rerun reads the manifest, purges any partially-written wave
dir, and continues from the last complete wave). Per-wave lineage (rows
in/out, offer stats, paths) lives in ``manifest.json`` + ``run.log.jsonl``.
"""

from __future__ import annotations

import json
import shutil
import os
import time
from dataclasses import asdict, dataclass

import pyarrow as pa


import ray
import ray.data

from ..gen import GenConfig, PAGES_SCHEMA, page_row, robots_table, seeds_table
from ..state.frontier import ShardedFrontier, route_outlinks_batch
from ..state.frontier_core import PolitenessConfig
from ..stages.extract import extract_pages_batch
from ..stages.fetch import PageStore, SandboxFetcher, wave_dataset

__all__ = ["CrawlConfig", "run_crawl", "generate_corpus_ray", "load_robots", "load_seeds"]


@dataclass
class CrawlConfig:
    num_shards: int = 8
    max_waves: int = 50
    max_depth: int = 64
    mode: str = "light"              # extract mode; 'full' builds content/html/page
    batch_size: int = 64             # rows per extract batch (html blobs are wide)
    extract_concurrency: int = 4     # reserved for actor-pool mode (model-loaded extractors)
    fetch_pool_size: int = 8         # FetchCache shards (sandbox fetch layer)
    record_order: bool = False       # record per-wave admitted URL order in the
                                     # manifest (parity tests; off at scale)
    small_wave_rows: int = 1024      # waves with fewer fetchable URLs run as
                                     # ONE fused remote task (same extract/
                                     # route functions) instead of a Dataset
                                     # pipeline: a streaming-executor launch
                                     # costs ~1s regardless of size, and BFS
                                     # tail waves of a few dozen URLs would
                                     # otherwise pay it in full. 0 disables.
    max_wave_size: int = 0           # global per-wave admission cap (memory
                                     # bound: wave x doc payload must fit the
                                     # object store); 0 = politeness-only
    write_concurrency: int = 0       # cap on the fused extract->route->
                                     # write stage; 0 = auto: min(16, task
                                     # CPUs after pool booking). The cap
                                     # exists because unbounded writers
                                     # collapse on one node's filesystem
                                     # (measured 2-3x wave slowdown at 32
                                     # writers on tmpfs; 16 is fine) — but
                                     # it must SCALE with the CPU level up
                                     # to that disk bound: Ray fuses the
                                     # write into the map stage, so a flat
                                     # cap of 8 throttled the whole pipeline
                                     # to 8 tasks at every level and broke
                                     # lo->hi scaling (8/3 != 4x). On a real
                                     # cluster the bound scales with node
                                     # count, each node writing its shard.
    pool_cpu_fraction: float = 0.0   # fraction of the session's CPUs booked
                                     # by the frontier + fetch-cache pools
                                     # (split evenly per actor). On a real
                                     # cluster these actors run ON the data
                                     # nodes and share their CPUs; booking
                                     # the share keeps their work inside the
                                     # measured budget at every parallelism
                                     # level instead of riding free on host
                                     # cores Ray was told not to use. 0 =
                                     # unbooked (test default).
    politeness: PolitenessConfig = None  # type: ignore[assignment]

    def __post_init__(self):
        if self.politeness is None:
            self.politeness = PolitenessConfig()


def load_robots(robots_parquet: str) -> dict[str, tuple[list[str], int]]:
    import pyarrow.parquet as pq

    table = pq.read_table(robots_parquet)
    return {
        r["host"]: (list(r["disallow_prefixes"] or []), int(r["crawl_delay_ms"]))
        for r in table.to_pylist()
    }


def load_seeds(seeds_parquet: str) -> list[tuple[str, int, int]]:
    import pyarrow.parquet as pq

    table = pq.read_table(seeds_parquet)
    return [(r["url"], int(r["priority"]), 0) for r in table.to_pylist()]


def generate_corpus_ray(out_dir: str, cfg: GenConfig, n_buckets: int = 32) -> PageStore:
    """Distributed corpus generation straight into the bucketized store.

    ``page_row`` is a pure function of the row index, so generation is an
    embarrassingly-parallel ``range -> map_batches`` with no shuffle: each
    task generates its index slice and rows land in their URL-hash bucket
    via ``partition_cols`` on write.
    """
    from ..stages.fetch import bucket_of

    def gen_batch(batch: dict) -> pa.Table:
        rows = [page_row(cfg, int(i)) for i in batch["id"]]
        table = pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)
        buckets = [bucket_of(u, n_buckets) for u in table.column("url").to_pylist()]
        return table.append_column("bucket", pa.array(buckets, pa.int32()))

    pages_root = os.path.join(out_dir, "pages")
    (
        ray.data.range(cfg.n_pages)
        .map_batches(gen_batch, batch_format="numpy", batch_size=256)
        .write_parquet(pages_root, partition_cols=["bucket"])
    )
    import pyarrow.parquet as pq

    pq.write_table(seeds_table(cfg), os.path.join(out_dir, "seeds.parquet"))
    pq.write_table(robots_table(cfg), os.path.join(out_dir, "robots.parquet"))
    store = PageStore(pages_root, n_buckets)
    store.compact()  # one file per bucket: wave reads open O(buckets) files
    return store


@ray.remote
def _small_wave_task(
    wave_docs_dir: str,
    mode: str,
    wave: int,
    shards: list,
    num_shards: int,
    run_id: str,
    max_depth: int,
    part: int,
    table,
) -> int:
    """BFS-tail fast path: fetch block -> extract -> route -> one parquet
    file, all in one task. Exactly the Dataset pipeline's per-batch
    functions, minus a streaming-executor launch a few-dozen-row wave
    cannot amortize. One task per cache-shard block (not one task for
    the whole wave): a 120-URL wave serialized through a single task
    costs ~1 s of flat extract time per tail wave; fanning out to the
    pool's blocks keeps it at one slot round."""
    import pyarrow.parquet as pq

    from ..stages.extract import extract_pages_batch
    from ..state.frontier import route_outlinks_batch

    if not table.num_rows:
        return 0
    docs = extract_pages_batch(table, mode=mode, wave=wave)
    docs = route_outlinks_batch(
        docs, shards, num_shards, wave=wave, run_id=run_id, max_depth=max_depth
    )
    os.makedirs(wave_docs_dir, exist_ok=True)
    pq.write_table(docs, os.path.join(wave_docs_dir, f"part-small-{part}.parquet"))
    return docs.num_rows


def _manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "manifest.json")


def _read_manifest(out_dir: str) -> dict | None:
    path = _manifest_path(out_dir)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def _write_manifest(out_dir: str, manifest: dict) -> None:
    tmp = _manifest_path(out_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, _manifest_path(out_dir))


def run_crawl(
    store: PageStore,
    seeds: list[tuple[str, int, int]],
    robots: dict[str, tuple[list[str], int]],
    out_dir: str,
    cfg: CrawlConfig | None = None,
    resume: bool = False,
    fetcher: SandboxFetcher | None = None,
) -> dict:
    """Run (or resume) a crawl; returns the final manifest.

    Resume contract: wave k is complete once docs/wave=k is fully written,
    shard checkpoints for k exist, and the manifest records k. A rerun
    with ``resume=True`` restores shard state from the last recorded wave
    and continues — finished waves are never refetched (BASELINE.md
    resume-correctness target).
    """
    cfg = cfg or CrawlConfig()
    os.makedirs(out_dir, exist_ok=True)
    ckpt_dir = os.path.join(out_dir, "ckpt")
    docs_dir = os.path.join(out_dir, "docs")
    from ..log import JsonlLogger

    log = JsonlLogger(os.path.join(out_dir, "run.log.jsonl"))

    # one fetch-cache pool for the whole run: bucket tables load once and
    # serve point fetches for every subsequent wave (callers may pass a
    # pre-warmed pool they own)
    cpu_share = 0.0
    if cfg.pool_cpu_fraction:
        total_cpu = ray.cluster_resources().get("CPU", 0)
        n_pool_actors = cfg.num_shards + cfg.fetch_pool_size
        cpu_share = cfg.pool_cpu_fraction * total_cpu / max(1, n_pool_actors)
    owns_fetcher = fetcher is None
    if owns_fetcher:
        fetcher = SandboxFetcher(
            store, pool_size=cfg.fetch_pool_size, cpu_share=cpu_share
        )
    # static page store => a fetch-miss can never succeed on retry, so
    # shards may remember misses and skip the pipeline; a network fetcher
    # (HttpFetcher) has transient misses and MUST re-fetch on retry.
    # The fetcher declares this itself (capability attribute, not type
    # sniffing) so wrappers/test doubles opt in explicitly.
    static_store = bool(getattr(fetcher, "static_store", False))
    frontier = ShardedFrontier(
        cfg.num_shards,
        robots,
        cfg.politeness,
        static_store=static_store,
        fetch_buckets=store.n_buckets if static_store else 0,
        cpu_share=cpu_share,
    )
    manifest = _read_manifest(out_dir) if resume else None
    start_wave = 0
    if manifest and manifest.get("complete_waves"):
        last = manifest["complete_waves"][-1]
        frontier.restore(ckpt_dir, last)
        start_wave = last + 1
        # a crash can leave a partially written docs dir for the wave
        # after the last complete one (writes overlap the next wave's
        # compute); rerunning that wave must start from an empty dir or
        # the rewrite would append duplicates
        for name in os.listdir(docs_dir) if os.path.isdir(docs_dir) else []:
            if name.startswith("wave="):
                w = int(name.split("=", 1)[1])
                if w >= start_wave:
                    shutil.rmtree(os.path.join(docs_dir, name), ignore_errors=True)
    else:
        manifest = {
            "complete_waves": [],
            "waves": {},
            "config": {
                "num_shards": cfg.num_shards,
                "mode": cfg.mode,
                "politeness": asdict(cfg.politeness),
            },
        }
        frontier.offer(seeds)

    wave = start_wave
    # unique per run: scopes the workers' offer caches so two runs in one
    # Ray session can never share (and corrupt) cache state; stable across
    # task retries within the run
    run_id = f"{out_dir}:{time.time_ns()}"
    total_cpu = ray.cluster_resources().get("CPU", 8)
    task_cpus = total_cpu - cfg.pool_cpu_fraction * total_cpu
    write_conc = cfg.write_concurrency or min(16, max(2, int(task_cpus)))

    try:
        # Driverless admission (north_rule: driver never holds entries):
        # shards stage + admit locally under the global cap (distributed
        # K-th-key selection); fetchable URLs flow shard -> fetcher as
        # Arrow refs; known-missing URLs (static page store: a retry can
        # never succeed) are requeued shard-side without entering the
        # pipeline. The driver sees O(shards) control messages per wave:
        # wave 0 pays a standalone admission barrier, every later wave's
        # admission rides the fused finish_checkpoint_stage turnaround.
        t_pop = time.time()
        admission = frontier.stage_and_admit(
            max_wave_size=cfg.max_wave_size, record_order=cfg.record_order
        )
        pop_s = time.time() - t_pop
        while wave < cfg.max_waves and admission["count"] > 0:
            t0 = time.time()
            phases: dict[str, float] = {"pop": round(pop_s, 3)}
            wave_info: dict = {"admitted": admission["count"]}
            if cfg.record_order:
                wave_info["order"] = admission["order"]

            wave_docs_dir = os.path.join(docs_dir, f"wave={wave}")
            t_f = time.time()
            fetchable = admission["count"] - admission.get("skipped_missing", 0)
            small = (
                cfg.small_wave_rows
                and admission["refs"]
                and fetchable <= cfg.small_wave_rows
            )
            # BFS-tail waves use the low-fanout fetch (one block per cache
            # shard): a few-dozen-row wave pays every extra actor message
            # as pure fixed cost
            data_refs = (
                fetcher.fetch_refs_small(admission["refs"])
                if small
                else fetcher.fetch_refs_from_tables(admission["refs"])
            )
            small = small and bool(data_refs)
            # streaming wave: one ReadTask per in-flight cache-shard ref
            # (no from_arrow_refs metadata barrier — extract overlaps the
            # cache shards still producing late blocks)
            ds = wave_dataset(data_refs) if data_refs and not small else None
            phases["fetch_refs"] = round(time.time() - t_f, 3)
            t_p = time.time()
            small_rows = 0
            if small:
                small_rows = sum(
                    ray.get(
                        [
                            _small_wave_task.remote(
                                wave_docs_dir,
                                cfg.mode,
                                wave,
                                frontier.shards,
                                cfg.num_shards,
                                run_id,
                                cfg.max_depth,
                                part,
                                ref,
                            )
                            for part, ref in enumerate(data_refs)
                        ]
                    )
                )
            if ds is not None:
                # ONE fused dataset execution per wave (fetch blocks ->
                # extract -> route -> write, no intermediate materialize:
                # a materialize barrier costs a full doc-payload round
                # trip through the object store, measured slower than the
                # write it would overlap); the route stage pushes
                # (url, ok, err) to the shard actors in passing
                ds.map_batches(
                    extract_pages_batch,
                    fn_kwargs={"mode": cfg.mode, "wave": wave},
                    batch_format="pyarrow",
                    batch_size=cfg.batch_size,
                ).map_batches(
                    route_outlinks_batch,
                    fn_kwargs={
                        "shards": frontier.shards,
                        "num_shards": cfg.num_shards,
                        "wave": wave,
                        "run_id": run_id,
                        "max_depth": cfg.max_depth,
                    },
                    batch_format="pyarrow",
                    batch_size=cfg.batch_size,
                ).write_parquet(wave_docs_dir, concurrency=write_conc)
            phases["pipeline"] = round(time.time() - t_p, 3)

            # fused inter-wave turnaround, ONE barrier: shards self-
            # account the wave (admitted vs pushed status, local requeue),
            # checkpoint post-finish state, and stage+admit the next wave
            t_r = time.time()
            finish, admission = frontier.finish_checkpoint_stage(
                ckpt_dir,
                wave,
                max_wave_size=cfg.max_wave_size,
                record_order=cfg.record_order,
            )
            pop_s = 0.0  # admission cost is inside the fused turnaround
            phases["turnaround"] = round(time.time() - t_r, 3)
            wave_info["phases"] = phases
            wave_info.update(
                {
                    "fetched": finish["fetched"],
                    "ok": finish["ok"],
                    "failures": finish["failures"],
                    # small-wave path: the fused task creates the dir only
                    # when it wrote rows — never record a dir that was
                    # never written (manifest consumers resolve it)
                    "docs_dir": wave_docs_dir
                    if (ds is not None or (small and small_rows > 0))
                    else None,
                    "elapsed_s": round(time.time() - t0, 3),
                }
            )
            manifest["waves"][str(wave)] = wave_info
            manifest["complete_waves"].append(wave)
            _write_manifest(out_dir, manifest)
            log.write(
                "wave", start=t0, wave=wave,
                admitted=wave_info["admitted"], ok=wave_info["ok"],
                failures=wave_info["failures"],
            )
            wave += 1

        if admission["count"] > 0:
            # hit max_waves with one more wave already staged by the fused
            # turnaround: return its entries to pending so final stats (and
            # a later resume from the last checkpoint) see them as pending
            frontier.unstage_wave()
        manifest["final_stats"] = frontier.stats()
        manifest["dead_letters"] = frontier.dead_letters()
        manifest["seen_count"] = frontier.seen_count()
        _write_manifest(out_dir, manifest)
        return manifest
    finally:
        if owns_fetcher:
            fetcher.shutdown()
        frontier.shutdown()
