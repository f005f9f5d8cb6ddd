"""Pipeline ≡ oracle parity (BASELINE.md targets; SURVEY.md §5.2-5.3).

The distributed crawl must reproduce the single-process oracle exactly:
- byte-identical extracted text per url (the north-rule invariant)
- identical URL-seen set
- identical crawl order under the same seed list + politeness budget
- identical dead letters
- identical results at different shard counts (parallelism independence)
- resume from checkpoint reproduces the uninterrupted run
"""

import json
import shutil

import pyarrow.dataset as pads
import pytest

from webscraper_ray.gen import GenConfig, page_row, robots_table, seeds_table
from webscraper_ray.oracle.crawl_sim import simulate_crawl
from webscraper_ray.pipelines.crawl import (
    CrawlConfig,
    generate_corpus_ray,
    load_robots,
    load_seeds,
    run_crawl,
)

GEN = GenConfig(n_pages=400, n_hosts=14, n_seeds=14)
MAX_WAVES = 30


@pytest.fixture(scope="module")
def corpus(ray_session, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("corpus"))
    store = generate_corpus_ray(out, GEN, n_buckets=8)
    seeds = load_seeds(out + "/seeds.parquet")
    robots = load_robots(out + "/robots.parquet")
    return store, seeds, robots


@pytest.fixture(scope="module")
def oracle_run():
    pages = {}
    for i in range(GEN.n_pages):
        row = page_row(GEN, i)
        pages[row["url"]] = row["html"]
    seeds = [(r["url"], r["priority"]) for r in seeds_table(GEN).to_pylist()]
    robots = {
        r["host"]: (r["disallow_prefixes"], r["crawl_delay_ms"])
        for r in robots_table(GEN).to_pylist()
    }
    return simulate_crawl(pages, seeds, robots, max_waves=MAX_WAVES)


def _run(corpus, tmp_path, num_shards, resume=False, max_waves=MAX_WAVES, out=None):
    store, seeds, robots = corpus
    out = out or str(tmp_path / f"run_s{num_shards}")
    cfg = CrawlConfig(num_shards=num_shards, max_waves=max_waves, record_order=True)
    return out, run_crawl(store, seeds, robots, out, cfg, resume=resume)


def _order_of(manifest):
    return [
        u
        for w in manifest["complete_waves"]
        for u in manifest["waves"][str(w)].get("order", [])
    ]


def _docs_table(out):
    return pads.dataset(f"{out}/docs", partitioning="hive").to_table()


def test_parity_seen_order_text(corpus, oracle_run, tmp_path):
    out, manifest = _run(corpus, tmp_path, num_shards=4)

    # crawl order ≡ oracle (same politeness budget, same seeds)
    assert _order_of(manifest) == oracle_run.order

    # URL-seen set ≡ oracle
    assert manifest["seen_count"] == len(oracle_run.seen)

    # dead letters ≡ oracle (sorted; oracle's are in discovery order)
    assert [tuple(d) for d in manifest["dead_letters"]] == sorted(
        tuple(d) for d in oracle_run.dead_letters
    )

    # byte-identical extracted text per url, and identical doc sets
    docs = _docs_table(out)
    got = {
        u: t
        for u, t, ok in zip(
            docs.column("url").to_pylist(),
            docs.column("text").to_pylist(),
            docs.column("ok").to_pylist(),
        )
        if ok
    }
    want = {d["url"]: d["text"] for d in oracle_run.docs}
    assert got == want  # byte-for-byte text equality per url

    # deterministic ids match the oracle's (wave + url derived)
    got_ids = {
        u: i
        for u, i, ok in zip(
            docs.column("url").to_pylist(),
            docs.column("id").to_pylist(),
            docs.column("ok").to_pylist(),
        )
        if ok
    }
    want_ids = {d["url"]: d["id"] for d in oracle_run.docs}
    assert got_ids == want_ids


def test_parity_across_shard_counts(corpus, oracle_run, tmp_path):
    out2, m2 = _run(corpus, tmp_path, num_shards=2)
    assert _order_of(m2) == oracle_run.order
    assert m2["seen_count"] == len(oracle_run.seen)
    docs = _docs_table(out2)
    got = dict(zip(docs.column("url").to_pylist(), docs.column("text").to_pylist()))
    want = {d["url"]: d["text"] for d in oracle_run.docs}
    for u, t in want.items():
        assert got[u] == t


def test_resume_reproduces_full_run(corpus, oracle_run, tmp_path):
    # full run for reference
    out_full, m_full = _run(corpus, tmp_path, num_shards=3)
    # interrupted run: stop after 4 waves, then resume to completion
    out_part = str(tmp_path / "run_resume")
    _, m_part = _run(corpus, tmp_path, 3, max_waves=4, out=out_part)
    assert len(m_part["complete_waves"]) == 4
    _, m_res = _run(corpus, tmp_path, 3, resume=True, out=out_part)

    assert m_res["complete_waves"] == m_full["complete_waves"]
    assert _order_of(m_res) == _order_of(m_full) == oracle_run.order
    assert m_res["seen_count"] == m_full["seen_count"]

    # identical final docs (url -> text), waves written across both phases
    d_full = _docs_table(out_full)
    d_res = _docs_table(out_part)
    full_map = dict(
        zip(d_full.column("url").to_pylist(), d_full.column("text").to_pylist())
    )
    res_map = dict(
        zip(d_res.column("url").to_pylist(), d_res.column("text").to_pylist())
    )
    assert res_map == full_map


def test_manifest_lineage_recorded(corpus, tmp_path):
    out, manifest = _run(corpus, tmp_path, num_shards=4)
    with open(f"{out}/manifest.json") as f:
        on_disk = json.load(f)
    assert on_disk["complete_waves"] == manifest["complete_waves"]
    for w in on_disk["complete_waves"]:
        info = on_disk["waves"][str(w)]
        assert {"admitted", "fetched", "ok", "failures", "elapsed_s"} <= set(info)
    # per-wave frontier.stats() was dropped (it was a driver barrier per
    # wave); the run-level rollup remains
    assert "final_stats" in on_disk


def test_parity_with_wave_size_cap(corpus, tmp_path):
    """The global max_wave_size cap (memory bound) must stay shard-count
    independent and match the oracle applying the same rule."""
    from webscraper_ray.gen import page_row, robots_table, seeds_table

    pages = {}
    for i in range(GEN.n_pages):
        row = page_row(GEN, i)
        pages[row["url"]] = row["html"]
    seeds = [(r["url"], r["priority"]) for r in seeds_table(GEN).to_pylist()]
    robots = {
        r["host"]: (r["disallow_prefixes"], r["crawl_delay_ms"])
        for r in robots_table(GEN).to_pylist()
    }
    capped_oracle = simulate_crawl(pages, seeds, robots, max_waves=60, max_wave_size=50)

    store, pseeds, probots = corpus
    out = str(tmp_path / "capped")
    cfg = CrawlConfig(num_shards=3, max_waves=60, record_order=True, max_wave_size=50)
    manifest = run_crawl(store, pseeds, probots, out, cfg)
    assert all(
        manifest["waves"][str(w)]["admitted"] <= 50
        for w in manifest["complete_waves"]
    )
    assert _order_of(manifest) == capped_oracle.order
    assert manifest["seen_count"] == len(capped_oracle.seen)


def test_parity_with_max_depth(corpus, tmp_path):
    """cfg.max_depth threads into the route stage: pipeline ≡ oracle under
    a small depth cutoff (regression: the knob used to be dead in the
    distributed path, diverging from the oracle past the cutoff)."""
    store, seeds, robots = corpus
    pages = {}
    for i in range(GEN.n_pages):
        row = page_row(GEN, i)
        pages[row["url"]] = row["html"]
    oracle_seeds = [(r["url"], r["priority"]) for r in seeds_table(GEN).to_pylist()]
    for depth in (0, 1):
        want = simulate_crawl(
            pages, oracle_seeds, robots, max_waves=MAX_WAVES, max_depth=depth
        )
        out = str(tmp_path / f"run_depth{depth}")
        cfg = CrawlConfig(
            num_shards=3, max_waves=MAX_WAVES, max_depth=depth, record_order=True
        )
        manifest = run_crawl(store, seeds, robots, out, cfg)
        assert _order_of(manifest) == want.order, f"depth={depth}"
        assert manifest["seen_count"] == len(want.seen), f"depth={depth}"


def test_staged_admission_large_wave_smoke(ray_session):
    """1e6-entry wave through the driverless admission path: the driver
    exchanges only counts/refs with the shards (never entries), the
    K-th-key selection caps the wave exactly, and the admitted set is
    shard-count independent."""
    import ray

    from webscraper_ray.state.frontier import ShardedFrontier
    from webscraper_ray.state.frontier_core import PolitenessConfig

    cfg = PolitenessConfig(
        per_host_cap=64, seen_capacity=1 << 20, exact_check=False
    )
    n = 1_000_000
    cap = 100_000

    def admitted_urls(num_shards):
        frontier = ShardedFrontier(num_shards, robots={}, cfg=cfg)
        try:
            offers = [
                (f"https://h{i % 20000}.x/p{i}", 0, 0) for i in range(n)
            ]
            for lo in range(0, n, 50_000):
                frontier.offer(offers[lo : lo + 50_000])
            adm = frontier.stage_and_admit(max_wave_size=cap)
            assert adm["count"] == cap
            # the driver holds refs, not rows
            assert all(isinstance(r, ray.ObjectRef) for r in adm["refs"])
            tables = ray.get(adm["refs"])
            urls = set()
            for t in tables:
                urls.update(t.column("url").to_pylist())
            assert len(urls) == cap
            return urls
        finally:
            frontier.shutdown()

    a = admitted_urls(3)
    b = admitted_urls(5)
    assert a == b
