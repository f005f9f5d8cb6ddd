"""Network fetcher (HttpFetcher) against a loopback HTTP server.

Proves the drop-in claim for the fetch seam (SURVEY.md §7 hard part 6;
reference fetch ``src/crawler.ts:17-110``): the same
``fetch_wave_refs(entries) -> [ObjectRef[Table]]`` contract as the
sandbox fetcher, with misses (404/timeouts) silently absent so the
driver's wave_set − fetched_set requeue logic applies unchanged, and the
downstream extract stage consumes the fetched blocks as-is.
"""

import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from webscraper_ray.state.frontier_core import FrontierEntry

PAGES = {
    "/page0.html": "<html><head><title>Zero</title></head><body>"
    "<h1>Zero</h1><p>alpha beta</p><a href='/page1.html'>one</a></body></html>",
    "/page1.html": "<html><head><title>One</title></head><body>"
    "<h1>One</h1><p>gamma delta</p></body></html>",
}


class _Handler(BaseHTTPRequestHandler):
    def do_GET(self):  # noqa: N802 - stdlib API
        body = PAGES.get(self.path)
        if body is None:
            self.send_response(404)
            self.end_headers()
            return
        data = body.encode("utf-8")
        self.send_response(200)
        self.send_header("Content-Type", "text/html; charset=utf-8")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def log_message(self, *args):  # quiet
        pass


@pytest.fixture(scope="module")
def http_server():
    srv = HTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _entries(base, paths):
    return [FrontierEntry(0, 0, 0, f"{base}{p}") for p in paths]


def test_http_fetcher_contract(ray_session, http_server):
    import ray

    from webscraper_ray.stages.fetch import HttpFetcher

    fetcher = HttpFetcher(pool_size=2, max_threads=4, timeout_s=5.0)
    try:
        refs = fetcher.fetch_wave_refs(
            _entries(http_server, ["/page0.html", "/page1.html", "/missing.html"])
        )
        tables = ray.get(refs)
        rows = {r["url"]: r["html"] for t in tables for r in t.to_pylist()}
        assert rows == {
            f"{http_server}/page0.html": PAGES["/page0.html"],
            f"{http_server}/page1.html": PAGES["/page1.html"],
        }  # the 404 is absent -> requeued as fetch-miss by the driver
        for t in tables:
            assert set(t.column_names) == {"url", "html", "depth", "priority"}
    finally:
        fetcher.shutdown()


def test_http_fetch_feeds_extract_stage(ray_session, http_server):
    """fetch_wave(HttpFetcher) -> extract is the sandbox pipeline with
    only the fetcher swapped; extracted text matches the single-process
    oracle on the same HTML bytes."""
    from webscraper_ray.oracle.extract import extract
    from webscraper_ray.stages.extract import extract_pages_batch
    from webscraper_ray.stages.fetch import HttpFetcher, fetch_wave

    fetcher = HttpFetcher(pool_size=1, max_threads=2, timeout_s=5.0)
    try:
        ds = fetch_wave(None, _entries(http_server, sorted(PAGES)), fetcher=fetcher)
        docs = ds.map_batches(
            extract_pages_batch, fn_kwargs={"mode": "light", "wave": 0},
            batch_format="pyarrow",
        ).to_pandas()
        assert len(docs) == len(PAGES)
        for _, row in docs.iterrows():
            path = "/" + row["url"].rsplit("/", 1)[1]
            want = extract(row["url"], PAGES[path])
            assert row["ok"] and row["text"] == want.text
    finally:
        fetcher.shutdown()


def test_http_fetcher_driverless_table_path(ray_session, http_server):
    """fetch_refs_from_tables (the driverless wave flow): shard tables in
    the object store -> per-worker host-filtered fetches."""
    import pyarrow as pa
    import ray

    from webscraper_ray.stages.fetch import HttpFetcher

    urls = [f"{http_server}{p}" for p in sorted(PAGES)] + [f"{http_server}/missing.html"]
    table = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "depth": pa.array([0] * len(urls), pa.int32()),
            "priority": pa.array([0] * len(urls), pa.int32()),
        }
    )
    fetcher = HttpFetcher(pool_size=3, max_threads=2, timeout_s=5.0)
    try:
        refs = fetcher.fetch_refs_from_tables([ray.put(table)])
        rows = {r["url"]: r["html"] for t in ray.get(refs) for r in t.to_pylist()}
        assert rows == {
            f"{http_server}/page0.html": PAGES["/page0.html"],
            f"{http_server}/page1.html": PAGES["/page1.html"],
        }
    finally:
        fetcher.shutdown()


def test_full_crawl_http_path_parity(ray_session, tmp_path):
    """VERDICT r3 #9: a full MULTI-WAVE crawl through HttpFetcher over
    real loopback sockets — politeness, retries on 404s (the corpus's
    dangling junk links), dead-letter and write stages all exercised on
    the HTTP path — must reproduce the static-store run on the same
    corpus exactly: same wave order, same seen set, same dead letters,
    byte-identical extracted text."""
    from http.server import ThreadingHTTPServer

    import pyarrow.dataset as pads

    from webscraper_ray.gen import GenConfig, page_row
    from webscraper_ray.oracle.canon import canonicalize
    from webscraper_ray.pipelines.crawl import (
        CrawlConfig,
        generate_corpus_ray,
        load_robots,
        load_seeds,
        run_crawl,
    )
    from webscraper_ray.stages.fetch import HttpFetcher

    gen = GenConfig(n_pages=120, n_hosts=5, n_seeds=5)  # junk_links default on
    corpus_dir = str(tmp_path / "corpus")
    store = generate_corpus_ray(corpus_dir, gen, n_buckets=4)
    seeds = load_seeds(corpus_dir + "/seeds.parquet")
    robots = load_robots(corpus_dir + "/robots.parquet")
    cfg = CrawlConfig(num_shards=2, max_waves=20, record_order=True)

    # reference: the static-store (sandbox) run
    static_out = str(tmp_path / "static")
    static_manifest = run_crawl(store, seeds, robots, static_out, cfg)

    # loopback server: /host3.example/p/x.html -> the corpus page of
    # https://host3.example/p/x.html; unknown paths 404 (-> retry path)
    pages: dict[str, str] = {}
    for i in range(gen.n_pages):
        row = page_row(gen, i)
        pages[row["url"]] = row["html"]
        pages[canonicalize(row["url"])] = row["html"]

    class _CorpusHandler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802 - stdlib API
            body = pages.get("https://" + self.path.lstrip("/"))
            if body is None:
                self.send_response(404)
                self.end_headers()
                return
            data = body if isinstance(body, bytes) else body.encode("utf-8")
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def log_message(self, *args):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), _CorpusHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}/"
    fetcher = HttpFetcher(
        pool_size=2,
        max_threads=8,
        timeout_s=15.0,
        url_rewrite=[("https://", base)],  # mirror seam: request target only
    )
    try:
        http_out = str(tmp_path / "http")
        http_manifest = run_crawl(
            store, seeds, robots, http_out, cfg, fetcher=fetcher
        )
    finally:
        fetcher.shutdown()
        srv.shutdown()

    def order_of(m):
        return [
            u
            for w in m["complete_waves"]
            for u in m["waves"][str(w)].get("order", [])
        ]

    assert order_of(http_manifest) == order_of(static_manifest)
    assert http_manifest["seen_count"] == static_manifest["seen_count"]
    assert http_manifest["dead_letters"] == static_manifest["dead_letters"]
    # the corpus's junk links must actually exercise retries over sockets
    assert static_manifest["dead_letters"], "corpus produced no dead letters"

    def docs_of(out):
        t = pads.dataset(f"{out}/docs", partitioning="hive").to_table()
        return dict(
            zip(t.column("url").to_pylist(), t.column("text").to_pylist())
        )

    assert docs_of(http_out) == docs_of(static_out)
