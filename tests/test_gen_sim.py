"""Corpus generator determinism + oracle crawl simulator behavior."""

from webscraper_ray.gen import (
    GenConfig,
    page_row,
    page_url,
    pages_table,
    robots_table,
    seeds_table,
)
from webscraper_ray.oracle.canon import host_of
from webscraper_ray.oracle.crawl_sim import simulate_crawl
from webscraper_ray.state.frontier_core import PolitenessConfig

CFG = GenConfig(n_pages=300, n_hosts=12, n_seeds=12)


def _corpus(cfg=CFG):
    pages = {}
    for i in range(cfg.n_pages):
        row = page_row(cfg, i)
        pages[row["url"]] = row["html"]
    seeds = [(r["url"], r["priority"]) for r in seeds_table(cfg).to_pylist()]
    robots = {
        r["host"]: (r["disallow_prefixes"], r["crawl_delay_ms"])
        for r in robots_table(cfg).to_pylist()
    }
    return pages, seeds, robots


def test_page_rows_pure_function_of_index():
    assert page_row(CFG, 17) == page_row(CFG, 17)
    assert page_row(CFG, 17) != page_row(CFG, 18)


def test_pages_table_slices_concatenate():
    full = pages_table(CFG, 0, 40)
    parts = [pages_table(CFG, lo, lo + 10) for lo in range(0, 40, 10)]
    import pyarrow as pa

    assert pa.concat_tables(parts).equals(full)


def test_corpus_mix():
    tbl = pages_table(CFG)
    texts = tbl.column("text").to_pylist()
    failures = sum(1 for t in texts if t == "")
    assert 0 < failures < CFG.n_pages * 0.12  # no-heading pages exist but are rare
    urls = tbl.column("url").to_pylist()
    assert len(set(urls)) == CFG.n_pages
    hosts = {host_of(u) for u in urls}
    assert len(hosts) <= CFG.n_hosts
    # hot-host skew: top host has far more pages than median
    from collections import Counter

    counts = Counter(host_of(u) for u in urls).most_common()
    assert counts[0][1] > 3 * counts[len(counts) // 2][1]


def test_simulate_crawl_runs_and_dedupes():
    pages, seeds, robots = _corpus()
    res = simulate_crawl(pages, seeds, robots, max_waves=20)
    assert len(res.docs) > 50
    # crawl order repeats a url only for fetch-miss retries (initial
    # attempt + 3 retries = 4 attempts, crawlee maxRequestRetries=3);
    # successfully fetched docs are fetched exactly once
    from collections import Counter

    attempts = Counter(res.order)
    assert all(n <= 4 for n in attempts.values())
    doc_url_list = [d["url"] for d in res.docs]
    assert len(doc_url_list) == len(set(doc_url_list))
    assert all(attempts[u] == 1 for u in doc_url_list)
    # every doc url was in the seen set
    doc_urls = {d["url"] for d in res.docs}
    assert doc_urls <= res.seen
    # dead letters: only extraction failures ("not found") for no-heading pages
    reasons = {r for (_, r, _) in res.dead_letters}
    assert reasons <= {"not found", "fetch-miss"}
    # robots: no /private url was fetched from a disallowed host
    denied_hosts = {h for h, (p, _) in robots.items() if p}
    for url in res.order:
        if host_of(url) in denied_hosts:
            assert "/private" not in url


def test_simulate_deterministic():
    pages, seeds, robots = _corpus()
    r1 = simulate_crawl(pages, seeds, robots, max_waves=10)
    r2 = simulate_crawl(pages, seeds, robots, max_waves=10)
    assert r1.order == r2.order
    assert r1.seen == r2.seen
    assert [d["id"] for d in r1.docs] == [d["id"] for d in r2.docs]


def test_simulate_politeness_slows_hot_host():
    pages, seeds, robots = _corpus()
    tight = PolitenessConfig(window_ms=1000, per_host_cap=4)
    loose = PolitenessConfig(window_ms=1000, per_host_cap=1000)
    r_tight = simulate_crawl(pages, seeds, robots, cfg=tight, max_waves=8)
    r_loose = simulate_crawl(pages, seeds, robots, cfg=loose, max_waves=8)
    assert len(r_tight.order) < len(r_loose.order)  # cap throttles per wave


def test_golden_text_matches_simulated_extraction():
    cfg = GenConfig(n_pages=50, n_hosts=6, n_seeds=6)
    pages, seeds, robots = _corpus(cfg)
    golden = {page_url(cfg, i): page_row(cfg, i)["text"] for i in range(cfg.n_pages)}
    res = simulate_crawl(pages, seeds, robots, max_waves=10)
    for d in res.docs:
        assert d["text"] == golden[d["url"]]  # byte-identical per url


def test_jsonl_logger(tmp_path):
    import json

    from webscraper_ray.log import JsonlLogger

    log = JsonlLogger(str(tmp_path / "x" / "run.log.jsonl"))
    import time

    t0 = time.time()
    log.write("wave", start=t0, wave=1, admitted=10)
    log.write("done", level="warn", note="n")
    lines = [json.loads(l) for l in open(log.path)]
    assert lines[0]["action"] == "wave" and lines[0]["admitted"] == 10
    assert "elapsed" in lines[0] and lines[0]["elapsed"] >= 0
    assert lines[1]["level"] == "warn"
