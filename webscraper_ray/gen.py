"""Deterministic synthetic Common-Crawl-style corpus generator (FIXTURES.md F1-F3).

Produces the three input tables the crawler consumes:

- ``pages(url, warc_ts, html, text, lang)`` — per BASELINE.json input_hint;
  ``text`` is the GOLDEN extracted text = the oracle extractor run on
  ``html`` (the pipeline must reproduce it byte-identically per url).
- ``seeds(url, priority)`` — raw seed URLs incl. duplicates-after-canon.
- ``robots(host, disallow_prefixes, crawl_delay_ms)`` — politeness input.

Every row is a pure function of ``(seed, row_index, n_pages)`` — no
sequential RNG state — so the corpus can be generated in parallel with
``ray.data.range(n).map_batches(...)`` at bench scale and row-for-row
matches a local loop. Page mix (FIXTURES.md F1): h1 pages, h2-only
pages, ~3% no-heading failure pages, og:title overrides, script blocks,
a power-law link graph with hot hosts for skew tests, malformed /
non-https outlinks, rare near-1MiB oversize rows.
"""

from __future__ import annotations

import hashlib
import struct
from dataclasses import dataclass

import pyarrow as pa

from .oracle.extract import extract

__all__ = ["GenConfig", "page_row", "pages_table", "seeds_table", "robots_table",
           "page_url", "host_name", "PAGES_SCHEMA"]

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.large_string()),
        ("lang", pa.string()),
    ]
)

_LANG_VARIANTS = ["en", "zh", "es", "de", "fr", "French", "Español", "deu", "eng", "中文"]
_WORDS = (
    "data stream batch arrow shuffle block actor frontier crawl parse token "
    "index vector schema column filter merge sort group join spill page host "
    "link graph queue budget robot fetch wave shard text title body article"
).split()
_BASE_TS_US = 1_700_000_000_000_000  # 2023-11-14T22:13:20Z, microseconds


@dataclass(frozen=True)
class GenConfig:
    seed: int = 42
    n_pages: int = 2000
    n_hosts: int = 40
    n_seeds: int = 32
    # fraction weights for page variants (out of 100)
    pct_h2_only: int = 8
    pct_no_heading: int = 3
    pct_og_title: int = 25
    pct_script: int = 40
    pct_oversize: int = 0  # per-mille would be overkill at test scale; see oversize_every
    oversize_every: int = 997  # row i is oversize iff i % oversize_every == 7
    hot_hosts: int = 3          # first k hosts receive a large share of pages
    hot_share: int = 50         # % of pages on hot hosts (skew)
    max_outlinks: int = 12
    extra_degree: int = 0       # flat out-degree boost (denser graph for bench)
    page_scale: int = 1         # multiplies paragraph count and length; real
                                # Common-Crawl pages are tens of KB, the
                                # default unit page is ~3-5 KB (test speed)
    disallow_hosts_every: int = 5  # every k-th host gets a /private disallow
    junk_links: bool = True     # emit malformed / non-https / dangling-relative
                                # outlinks (canon-filter + retry-path coverage).
                                # Bench corpora disable them: each dangling link
                                # spawns a 4-attempt retry tail of pure fixed
                                # per-wave cost, measuring the retry schedule
                                # rather than engine throughput.


def _h(seed: int, *parts: object) -> int:
    """Stable 64-bit hash of (seed, parts) — the only randomness source."""
    data = struct.pack("<q", seed) + "\x1f".join(str(p) for p in parts).encode()
    return int.from_bytes(hashlib.blake2b(data, digest_size=8).digest(), "little")


def host_name(cfg: GenConfig, host_idx: int) -> str:
    return f"h{host_idx}.site{host_idx % 7}.example"


def _host_of_page(cfg: GenConfig, i: int) -> int:
    """Skewed host assignment: ``hot_share``% of pages on the hot hosts."""
    r = _h(cfg.seed, "host", i) % 100
    if r < cfg.hot_share:
        return _h(cfg.seed, "hothost", i) % cfg.hot_hosts
    return cfg.hot_hosts + _h(cfg.seed, "coldhost", i) % max(1, cfg.n_hosts - cfg.hot_hosts)


def page_url(cfg: GenConfig, i: int) -> str:
    """Canonical URL of page ``i`` (already canonical by construction)."""
    host = host_name(cfg, _host_of_page(cfg, i))
    section = "private" if _h(cfg.seed, "priv", i) % 17 == 0 else f"s{_h(cfg.seed, 'sec', i) % 5}"
    return f"https://{host}/{section}/p{i}"


def _words(seed: int, *key: object, n: int) -> str:
    return " ".join(_WORDS[_h(seed, *key, j) % len(_WORDS)] for j in range(n))


def _outlink_hrefs(cfg: GenConfig, i: int) -> list[str]:
    """Power-law out-degree link targets; mix of clean/variant/invalid links."""
    r = _h(cfg.seed, "deg", i) % 100
    degree = (r % 4) if r < 60 else (4 + r % 9) if r < 95 else (13 + r % (cfg.max_outlinks))
    degree += cfg.extra_degree
    hrefs: list[str] = []
    for k in range(degree):
        target = _h(cfg.seed, "lnk", i, k) % cfg.n_pages
        url = page_url(cfg, target)
        variant = _h(cfg.seed, "lv", i, k) % 10
        if variant == 0:
            url += "#section-2"                       # fragment -> canon strips
        elif variant == 1:
            url += "?utm_source=gen&utm_medium=test"  # utm -> canon strips
        elif variant == 2:
            url = url.replace("https://", "https://", 1).replace(".example/", ".EXAMPLE/", 1)
        hrefs.append(url)
    if cfg.junk_links:
        junk = _h(cfg.seed, "junk", i) % 10
        if junk == 0:
            hrefs.append("http://insecure.example/x")     # non-https -> filtered
        elif junk == 1:
            hrefs.append("javascript:void(0)")            # malformed -> filtered
        elif junk == 2:
            hrefs.append("/relative/only")                # resolves against page url
    return hrefs


def page_html(cfg: GenConfig, i: int) -> str:
    """Deterministic page HTML for row ``i`` (pure function)."""
    variant = _h(cfg.seed, "var", i) % 100
    title_text = f"Page {i}: " + _words(cfg.seed, "ttl", i, n=4)
    og = variant < cfg.pct_og_title
    no_heading = cfg.pct_og_title <= variant < cfg.pct_og_title + cfg.pct_no_heading
    h2_only = (
        cfg.pct_og_title + cfg.pct_no_heading
        <= variant
        < cfg.pct_og_title + cfg.pct_no_heading + cfg.pct_h2_only
    )
    script = _h(cfg.seed, "scr", i) % 100 < cfg.pct_script

    head_parts = ["<meta charset='utf-8'>", f"<title>t{i}</title>"]
    if og:
        head_parts.append(f'<meta property="og:title" content="OG {title_text}">')
        head_parts.append('<meta property="og:type" content="article">')
        head_parts.append(f'<meta property="article:section" content="s{i % 5}">')
        head_parts.append('<meta property="twitter:x" content="ignored">')

    n_paras = (2 + _h(cfg.seed, "np", i) % 6) * cfg.page_scale
    paras = [
        f"<p>{_words(cfg.seed, 'par', i, p, n=(12 + _h(cfg.seed, 'pl', i, p) % 25) * cfg.page_scale)}</p>"
        for p in range(n_paras)
    ]
    links = "".join(
        f'<a href="{href}">{_words(cfg.seed, "lt", i, k, n=2)}</a> '
        for k, href in enumerate(_outlink_hrefs(cfg, i))
    )
    heading = (
        "" if no_heading
        else f"<h2>{title_text}</h2>" if h2_only
        else f"<h1>{title_text}</h1>"
    )
    script_block = "<script>var x = 'never in text';</script>" if script else ""
    filler = ""
    if i % cfg.oversize_every == 7:  # rare near-1MiB row (size-guard path)
        filler = f"<p>{'oversize-filler ' * 70000}</p>"

    body = (
        f"<article><div>{heading}"
        f"{paras[0] if paras else ''}</div>"
        f"{''.join(paras[1:])}<p>{links}</p>{filler}</article>"
    )
    return (
        f"<html><head>{''.join(head_parts)}{script_block}</head>"
        f"<body><nav>{_words(cfg.seed, 'nav', i, n=3)}</nav>{body}"
        f"<footer>{_words(cfg.seed, 'ft', i, n=4)}</footer></body></html>"
    )


def page_row(cfg: GenConfig, i: int) -> dict:
    """One pages-table row; ``text`` = golden oracle extraction (or '' on fail)."""
    url = page_url(cfg, i)
    html = page_html(cfg, i)
    result = extract(url, html)
    return {
        "url": url,
        "warc_ts": _BASE_TS_US + (_h(cfg.seed, "ts", i) % (86_400_000_000 * 30)),
        "html": html.encode("utf-8"),
        "text": result.text if result.ok else "",
        "lang": _LANG_VARIANTS[_h(cfg.seed, "lang", i) % len(_LANG_VARIANTS)],
    }


def pages_table(cfg: GenConfig, lo: int = 0, hi: int | None = None) -> pa.Table:
    """Rows [lo, hi) of the pages table as Arrow (parallel-friendly slice)."""
    hi = cfg.n_pages if hi is None else hi
    rows = [page_row(cfg, i) for i in range(lo, hi)]
    return pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)


def seeds_table(cfg: GenConfig) -> pa.Table:
    """Seed list: first pages of each host region + canon-duplicate variants."""
    rows = []
    for s in range(cfg.n_seeds):
        target = (s * 37) % cfg.n_pages
        url = page_url(cfg, target)
        rows.append({"url": url, "priority": s % 3})
        if s % 4 == 0:  # duplicate after canonicalization
            rows.append({"url": url + "?utm_source=seed#top", "priority": s % 3})
        if s % 9 == 0:  # invalid scheme -> must be filtered by E1
            rows.append({"url": url.replace("https://", "http://", 1), "priority": 0})
    return pa.Table.from_pylist(
        rows, schema=pa.schema([("url", pa.string()), ("priority", pa.int32())])
    )


def robots_table(cfg: GenConfig) -> pa.Table:
    rows = []
    for h in range(cfg.n_hosts):
        disallow = ["/private"] if h % cfg.disallow_hosts_every == 0 else []
        delay = [0, 50, 200, 1000][_h(cfg.seed, "rb", h) % 4]
        rows.append(
            {"host": host_name(cfg, h), "disallow_prefixes": disallow, "crawl_delay_ms": delay}
        )
    return pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [
                ("host", pa.string()),
                ("disallow_prefixes", pa.list_(pa.string())),
                ("crawl_delay_ms", pa.int64()),
            ]
        ),
    )


def write_corpus(out_dir: str, cfg: GenConfig) -> None:
    """Write the three tables under ``out_dir`` (single-process; tests).

    Bench-scale corpora are generated distributed instead — see
    ``webscraper_ray.pipelines.crawl.generate_corpus_ray``.
    """
    import pathlib

    import pyarrow.parquet as pq

    path = pathlib.Path(out_dir)
    path.mkdir(parents=True, exist_ok=True)
    pq.write_table(pages_table(cfg), path / "pages.parquet")
    pq.write_table(seeds_table(cfg), path / "seeds.parquet")
    pq.write_table(robots_table(cfg), path / "robots.parquet")
