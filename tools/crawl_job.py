"""`ray job submit` entry point for the batch crawl — the deployment
path the engine is designed for:

    ray job submit --working-dir /root/repo -- \
        python tools/crawl_job.py --corpus /data/corpus --out /data/run \
        --mode full --waves 50 [--resume]

On the sandbox it runs standalone the same way (`python tools/crawl_job.py
...`); the script owns its Ray session ONLY when none exists (`ray job
submit` and the driver both pre-initialize), per the repo's session
discipline. Generates a synthetic corpus first if `--gen-pages` is set
and the corpus dir is empty.

The crawl itself is resumable (`--resume` continues from the last
complete wave's shard checkpoints) and writes per-wave partitioned docs
plus a manifest with per-wave lineage and phase timings — the
per-partition lineage/metrics contract.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--corpus", required=True, help="bucketized page-store dir")
    ap.add_argument("--out", required=True, help="run output dir (docs + ckpt)")
    ap.add_argument("--mode", default="light", choices=["light", "full"])
    ap.add_argument("--waves", type=int, default=50)
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--max-wave-size", type=int, default=0)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument(
        "--gen-pages",
        type=int,
        default=0,
        help="if >0 and the corpus dir is empty, synthesize this many pages",
    )
    ap.add_argument("--gen-hosts", type=int, default=64)
    ap.add_argument("--gen-seeds", type=int, default=64)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():  # ray job submit / driver pre-initialize
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"))

    from webscraper_ray.gen import GenConfig
    from webscraper_ray.pipelines.crawl import (
        CrawlConfig,
        generate_corpus_ray,
        load_robots,
        load_seeds,
        run_crawl,
    )
    from webscraper_ray.stages.fetch import PageStore

    pages_dir = os.path.join(args.corpus, "pages")
    if not os.path.isdir(pages_dir):
        if not args.gen_pages:
            ap.error(f"{pages_dir} missing and --gen-pages not set")
        store = generate_corpus_ray(
            args.corpus,
            GenConfig(
                n_pages=args.gen_pages,
                n_hosts=args.gen_hosts,
                n_seeds=args.gen_seeds,
            ),
            n_buckets=32,
        )
    else:
        n_buckets = sum(
            1 for d in os.listdir(pages_dir) if d.startswith("bucket=")
        )
        store = PageStore(pages_dir, n_buckets)

    seeds = load_seeds(os.path.join(args.corpus, "seeds.parquet"))
    robots = load_robots(os.path.join(args.corpus, "robots.parquet"))
    cfg = CrawlConfig(
        num_shards=args.shards,
        max_waves=args.waves,
        mode=args.mode,
        max_wave_size=args.max_wave_size,
    )
    manifest = run_crawl(
        store, seeds, robots, args.out, cfg=cfg, resume=args.resume
    )
    stats = manifest.get("final_stats", {})
    print(
        json.dumps(
            {
                "waves": len(manifest.get("complete_waves", [])),
                "seen": manifest.get("seen_count"),
                "queued": stats.get("queued"),
                "dead_letters": stats.get("dead_letters"),
                "docs_dir": os.path.join(args.out, "docs"),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
