"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship pipeline — the distributed batch crawl —
end-to-end at micro scale: it deterministically synthesizes a
Common-Crawl-style page corpus (BASELINE.json input_hint schema) into the
bucketized page store, runs the sharded-frontier wave crawl in FULL
document mode (extract -> tree -> CBOR -> clean HTML), and returns the
docs table. ``queries()`` / ``oracle_sql()`` expose the relational /
dedup / ANN / text / window operator inventory over the driver's
TPC-H-ish tables (SURVEY.md §2 mapping cited per query in
``webscraper_ray.queries``).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable
from typing import Any

_ENTRY_DIR = "/tmp/webscraper_ray_entry"


def entry() -> Any:
    """Flagship crawl on a synthesized micro corpus; returns the docs
    Dataset (full document schema incl. CBOR content and clean HTML)."""
    import ray.data

    from webscraper_ray.gen import GenConfig
    from webscraper_ray.pipelines.crawl import (
        CrawlConfig,
        generate_corpus_ray,
        load_robots,
        load_seeds,
        run_crawl,
    )

    gen_cfg = GenConfig(n_pages=250, n_hosts=12, n_seeds=12)
    corpus_dir = os.path.join(_ENTRY_DIR, "corpus")
    run_dir = os.path.join(_ENTRY_DIR, "run")
    shutil.rmtree(run_dir, ignore_errors=True)
    if not os.path.isdir(os.path.join(corpus_dir, "pages")):
        shutil.rmtree(corpus_dir, ignore_errors=True)
        store = generate_corpus_ray(corpus_dir, gen_cfg, n_buckets=8)
    else:
        from webscraper_ray.stages.fetch import PageStore

        store = PageStore(os.path.join(corpus_dir, "pages"), 8)

    seeds = load_seeds(os.path.join(corpus_dir, "seeds.parquet"))
    robots = load_robots(os.path.join(corpus_dir, "robots.parquet"))
    run_crawl(
        store,
        seeds,
        robots,
        run_dir,
        CrawlConfig(num_shards=4, max_waves=12, mode="full"),
    )
    return ray.data.read_parquet(os.path.join(run_dir, "docs"))


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    from webscraper_ray.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for EVERY registered query — the sketch /
    LSH operators use md5 / hyperplane hash families chosen to be
    reproducible in SQL (hex-cast md5 prefixes, xor permutations, inlined
    plane constants), so even the approximate algorithms are value-hash
    gated rather than rows-only."""
    from webscraper_ray.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
