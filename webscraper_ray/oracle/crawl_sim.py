"""Single-process crawl simulator — the oracle for the Ray pipeline.

Runs the whole crawl in one process with one :class:`FrontierCore`
instance: seeds -> wave k -> admit (politeness order) -> "fetch" (dict
lookup in the pages table, the sandbox stand-in for network I/O — SURVEY.md
J4) -> extract (E1-E8) -> outlinks -> offer. The distributed pipeline
must reproduce this run exactly: same URL-seen set, same crawl order, same
per-url extracted text (BASELINE.md targets).

Reference trace being modelled: ``GET /v1/scraping`` (SURVEY.md §3.1) —
freshness/lock (here: seen-filter), scraping (here: fetch-join + extract),
save (here: docs rows), generalized from one URL per request to BFS waves.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..state.frontier_core import FrontierCore, PolitenessConfig
from .extract import extract
from .xid import make_xid

__all__ = ["CrawlResult", "simulate_crawl"]

WAVE_TS0 = 1_700_000_000  # deterministic xid timestamp base (one tick per wave)


@dataclass
class CrawlResult:
    docs: list[dict] = field(default_factory=list)          # doc rows (F4 schema-ish)
    order: list[str] = field(default_factory=list)          # fetch order, canon urls
    seen: set[str] = field(default_factory=set)             # final URL-seen set
    dead_letters: list[tuple[str, str, int]] = field(default_factory=list)
    waves: int = 0
    stats: dict = field(default_factory=dict)


def simulate_crawl(
    pages: dict[str, bytes | str],
    seeds: list[tuple[str, int]],
    robots: dict[str, tuple[list[str], int]] | None = None,
    cfg: PolitenessConfig | None = None,
    max_waves: int = 50,
    max_depth: int = 64,
    max_wave_size: int = 0,
) -> CrawlResult:
    """``pages``: canon_url -> html; ``seeds``: (raw_url, priority)."""
    frontier = FrontierCore(robots=robots or {}, cfg=cfg)
    for raw_url, priority in seeds:
        frontier.offer(raw_url, priority=priority, depth=0)

    result = CrawlResult()
    wave = 0
    while wave < max_waves:
        admitted = frontier.pop_wave()
        if max_wave_size and len(admitted) > max_wave_size:
            # same global cap rule as ShardedFrontier.pop_wave
            frontier.restore_pending(admitted[max_wave_size:])
            admitted = admitted[:max_wave_size]
        if not admitted:
            break
        for entry in admitted:
            result.order.append(entry.canon_url)
            html = pages.get(entry.canon_url)
            if html is None:
                frontier.requeue_failure(entry, "fetch-miss")
                continue
            if isinstance(html, bytes):
                html = html.decode("utf-8")
            r = extract(entry.canon_url, html)
            if not r.ok:
                frontier.requeue_failure(entry, r.err)
                continue
            result.docs.append(
                {
                    "id": make_xid(WAVE_TS0 + wave, wave, entry.canon_url),
                    "url": r.url,
                    "src": r.src,
                    "title": r.title,
                    "meta": r.meta,
                    "text": r.text,
                    "wave": wave,
                    "depth": entry.depth,
                }
            )
            if entry.depth < max_depth:
                for link in r.outlinks:
                    frontier.offer(link, priority=entry.priority, depth=entry.depth + 1)
        wave += 1

    result.waves = wave
    result.seen = set(frontier.seen_exact or ())
    result.dead_letters = list(frontier.dead_letters)
    result.stats = vars(frontier.stats) | {"pending": frontier.pending()}
    return result
