"""Sharded frontier: Ray actors wrapping :class:`FrontierCore` (SURVEY.md M2).

Replaces the reference's coordination state — crawlee RequestQueue dedup,
ScyllaDB freshness rows and the 60 s scrape lock (ST1/ST3,
``src/crawler.ts:99-104``, ``src/db/model.ts:45-50,115-135``) — with
``num_shards`` named Ray actors, shard = ``hash(host) % num_shards``
(north_rule: explicit hash-partitioning of the frontier by host). Because
politeness budgets, robots rules and the seen-filter are all per-host and
a host lives in exactly one shard, the union of per-shard admissions
equals the single-core oracle's admission — sharding does not change
semantics, only throughput.

Actors are NAMED (not an anonymous pool): waves must address the same
shard repeatedly and checkpoints are per-shard (SURVEY.md §7). Offers are
routed worker-side by :class:`RouteOutlinks` (a map_batches stage holding
the actor handles), so outlink traffic never funnels through the driver.
"""

from __future__ import annotations

import hashlib
import os
import pickle

import pyarrow as pa

import ray

from ..oracle.canon import host_of
from .frontier_core import FrontierCore, FrontierEntry, PolitenessConfig

__all__ = [
    "shard_of_host",
    "shard_of_url",
    "FrontierShard",
    "ShardedFrontier",
    "route_outlinks_batch",
]


def shard_of_host(host: str, num_shards: int) -> int:
    digest = hashlib.blake2b(host.encode(), digest_size=8).digest()
    return int.from_bytes(digest, "little") % num_shards


def shard_of_url(canon_url: str, num_shards: int) -> int:
    return shard_of_host(host_of(canon_url), num_shards)


@ray.remote(num_cpus=0)
class FrontierShard:
    # num_cpus=0: shards are lightweight state holders serving short
    # messages; reserving whole CPUs for them would starve the Data
    # stages' task/actor slots (the scheduler deadlock we hit otherwise).
    """One frontier shard. All methods take/return plain picklables."""

    def __init__(self, shard_id: int, robots: dict, cfg: PolitenessConfig | None = None):
        self.shard_id = shard_id
        self.core = FrontierCore(robots=robots, cfg=cfg)
        self._status: list[tuple[str, bool, str]] = []

    def offer_batch(self, offers: list[tuple[str, int, int]]) -> dict:
        """offers: [(raw_url, priority, depth)]; returns outcome counts."""
        counts = {"queued": 0, "duplicate": 0, "invalid": 0, "robots": 0}
        for url, priority, depth in offers:
            counts[self.core.offer(url, priority=priority, depth=depth)] += 1
        return counts

    def offer_canonical_batch(self, offers: list[tuple[str, int, int]]) -> dict:
        """Pre-canonicalized offers (extract emits canonical outlinks);
        skips per-URL canonicalization in this single-threaded actor."""
        counts = {"queued": 0, "duplicate": 0, "invalid": 0, "robots": 0}
        for url, priority, depth in offers:
            counts[self.core.offer_canonical(url, priority=priority, depth=depth)] += 1
        return counts

    def ingest(
        self,
        offers: list[tuple[str, int, int]],
        status: list[tuple[str, bool, str]],
    ) -> None:
        """One combined message per (route task, shard): canonical offers
        + wave status — halves the RPC count of the route stage."""
        offer = self.core.offer_canonical
        for url, priority, depth in offers:
            offer(url, priority=priority, depth=depth)
        self._status.extend(status)

    def report_status(self, rows: list[tuple[str, bool, str]]) -> None:
        """Wave fetch/extract status (url, ok, err) pushed by the route
        stage during pipeline execution — lets the driver learn the wave
        outcome without a second dataset execution."""
        self._status.extend(rows)

    def drain_status(self) -> list[tuple[str, bool, str]]:
        out = self._status
        self._status = []
        return out

    def pop_wave(self) -> list[FrontierEntry]:
        return self.core.pop_wave()

    def restore_pending(self, entries: list[FrontierEntry]) -> None:
        self.core.restore_pending(entries)

    def requeue_batch(self, failures: list[tuple[FrontierEntry, str]]) -> int:
        return sum(self.core.requeue_failure(e, reason) for e, reason in failures)

    def pending(self) -> int:
        return self.core.pending()

    def stats(self) -> dict:
        return vars(self.core.stats) | {
            "pending": self.core.pending(),
            "dead_letters": len(self.core.dead_letters),
        }

    def dead_letters(self) -> list[tuple[str, str, int]]:
        return list(self.core.dead_letters)

    def seen_urls(self) -> set[str]:
        """Exact seen set — test scale only (exact_check mode)."""
        return set(self.core.seen_exact or ())

    def checkpoint(self, path: str) -> str:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(self.core.state(), f)
        os.replace(tmp, path)  # atomic publish
        return path

    def restore(self, path: str) -> int:
        with open(path, "rb") as f:
            self.core = FrontierCore.from_state(pickle.load(f))
        return self.core.pending()


class ShardedFrontier:
    """Driver-side facade over the named shard actors."""

    def __init__(
        self,
        num_shards: int,
        robots: dict[str, tuple[list[str], int]],
        cfg: PolitenessConfig | None = None,
    ):
        self.num_shards = num_shards
        # robots rules are sharded BY HOST like everything else (north
        # rule: robots cache keyed by host): each shard holds only its own
        # hosts' rules, so robots state scales horizontally instead of
        # being replicated num_shards times
        robots_by_shard: list[dict] = [{} for _ in range(num_shards)]
        for host, rules in robots.items():
            robots_by_shard[shard_of_host(host, num_shards)][host] = rules
        self.shards = [
            FrontierShard.remote(i, robots_by_shard[i], cfg)
            for i in range(num_shards)
        ]

    def _group(self, offers: list[tuple[str, int, int]]) -> dict[int, list]:
        grouped: dict[int, list] = {}
        for url, priority, depth in offers:
            # route by host of the RAW url; canonicalization preserves the
            # (lowercased) host, so raw-host routing agrees with canon-host
            grouped.setdefault(
                shard_of_host(host_of(url.strip().lower()), self.num_shards), []
            ).append((url, priority, depth))
        return grouped

    def offer(self, offers: list[tuple[str, int, int]]) -> dict:
        total = {"queued": 0, "duplicate": 0, "invalid": 0, "robots": 0}
        grouped = self._group(offers)
        results = ray.get(
            [self.shards[s].offer_batch.remote(batch) for s, batch in grouped.items()]
        )
        for counts in results:
            for k, v in counts.items():
                total[k] += v
        return total

    def pop_wave(self, max_wave_size: int = 0) -> list[FrontierEntry]:
        """Merged politeness-ordered admission across shards.

        ``max_wave_size`` > 0 caps the wave at the K globally smallest
        entries (memory bound: wave size x doc payload must fit the
        object store); the truncated tail is restored to its shards and
        competes again next wave. The cap is applied to the SORTED merged
        list, so the admitted set is a pure function of the pending state
        — shard-count independent, same rule as the oracle simulator.
        """
        parts = ray.get([s.pop_wave.remote() for s in self.shards])
        merged = [e for part in parts for e in part]
        merged.sort(key=lambda e: e.sort_key)
        if max_wave_size and len(merged) > max_wave_size:
            overflow = merged[max_wave_size:]
            merged = merged[:max_wave_size]
            grouped: dict[int, list] = {}
            for e in overflow:
                grouped.setdefault(
                    shard_of_url(e.canon_url, self.num_shards), []
                ).append(e)
            ray.get(
                [self.shards[s].restore_pending.remote(b) for s, b in grouped.items()]
            )
        return merged

    def requeue(self, failures: list[tuple[FrontierEntry, str]]) -> None:
        grouped: dict[int, list] = {}
        for entry, reason in failures:
            grouped.setdefault(
                shard_of_url(entry.canon_url, self.num_shards), []
            ).append((entry, reason))
        ray.get([self.shards[s].requeue_batch.remote(b) for s, b in grouped.items()])

    def pending(self) -> int:
        return sum(ray.get([s.pending.remote() for s in self.shards]))

    def stats(self) -> dict:
        parts = ray.get([s.stats.remote() for s in self.shards])
        out: dict = {}
        for p in parts:
            for k, v in p.items():
                out[k] = out.get(k, 0) + v
        return out

    def dead_letters(self) -> list[tuple[str, str, int]]:
        parts = ray.get([s.dead_letters.remote() for s in self.shards])
        return sorted(d for part in parts for d in part)

    def drain_status(self) -> dict[str, tuple[bool, str]]:
        """Wave status pushed by the route stage; deduped by url (a Ray
        task retry may double-report identical rows)."""
        parts = ray.get([s.drain_status.remote() for s in self.shards])
        return {url: (ok, err) for part in parts for (url, ok, err) in part}

    def seen_urls(self) -> set[str]:
        parts = ray.get([s.seen_urls.remote() for s in self.shards])
        return set().union(*parts) if parts else set()

    def checkpoint(self, ckpt_dir: str, wave: int) -> list[str]:
        paths = [
            os.path.join(ckpt_dir, f"wave_{wave}", f"shard_{i}.pkl")
            for i in range(self.num_shards)
        ]
        return ray.get(
            [s.checkpoint.remote(p) for s, p in zip(self.shards, paths)]
        )

    def restore(self, ckpt_dir: str, wave: int) -> int:
        paths = [
            os.path.join(ckpt_dir, f"wave_{wave}", f"shard_{i}.pkl")
            for i in range(self.num_shards)
        ]
        return sum(
            ray.get([s.restore.remote(p) for s, p in zip(self.shards, paths)])
        )

    def shutdown(self) -> None:
        for s in self.shards:
            ray.kill(s)
        self.shards = []


# Worker-local cross-batch offer cache: url -> smallest (priority, depth)
# key already shipped this wave. Dropping an offer whose key is >= one
# already sent is a no-op under the frontier's commutative min-key rule,
# so this filter cannot change admissions — it only cuts shard-actor
# traffic (dup rates of 5-10x are typical on dense link graphs, and the
# actors are the serialized resource the route stage convoys on).
# Scoped by (run_id, wave): Ray worker processes outlive a crawl run, and
# a cache keyed by wave alone can collide with a PREVIOUS run's same-
# numbered wave in the same session, silently suppressing offers (a real
# flake observed across back-to-back test runs).
_SENT_OFFERS: dict = {"scope": None, "keys": {}}


def route_outlinks_batch(
    batch: pa.Table,
    shards: list,
    num_shards: int,
    wave: int = 0,
    run_id: str = "",
    max_depth: int = 64,
) -> pa.Table:
    """map_batches TASK stage: ship each batch's outlinks to the frontier
    shards worker-side, then drop the outlinks column (docs don't store it).

    Offers are idempotent (seen-filter dedup), so a Ray task retry at worst
    double-counts offer stats — it cannot corrupt the frontier. Blocking on
    the offer acks applies backpressure to the pipeline.

    ``max_depth`` mirrors the oracle's cutoff (crawl_sim.py: offer only
    when ``entry.depth < max_depth``): a page AT the depth limit reports
    status but offers nothing.
    """
    scope = (run_id, wave)
    if _SENT_OFFERS["scope"] != scope:
        _SENT_OFFERS["scope"] = scope
        _SENT_OFFERS["keys"] = {}
    sent: dict = _SENT_OFFERS["keys"]
    ok = batch.column("ok").to_pylist()
    urls = batch.column("url").to_pylist()
    errs = batch.column("err").to_pylist()
    urls_lists = batch.column("outlinks").to_pylist()
    priorities = (
        batch.column("priority").to_pylist()
        if "priority" in batch.column_names
        else [0] * len(ok)
    )
    depths = batch.column("depth").to_pylist()
    status: dict[int, list] = {}
    best: dict[str, tuple[int, int]] = {}
    for url, row_ok, err, links, priority, depth in zip(
        urls, ok, errs, urls_lists, priorities, depths
    ):
        status.setdefault(shard_of_url(url, num_shards), []).append((url, row_ok, err))
        if not row_ok or not links or depth >= max_depth:
            continue
        for link in links:
            key = (priority, depth + 1)
            prev = best.get(link)
            if prev is None or key < prev:
                prev_sent = sent.get(link)
                if prev_sent is None or key < prev_sent:
                    best[link] = key
    grouped: dict[int, list] = {}
    for link, key in best.items():
        grouped.setdefault(
            shard_of_url(link, num_shards), []
        ).append((link, key[0], key[1]))
    # outlinks come canonicalized from the extract stage; one combined
    # (offers+status) message per shard applies backpressure via ray.get
    pending = [
        shards[s].ingest.remote(grouped.get(s, []), status.get(s, []))
        for s in set(grouped) | set(status)
    ]
    if pending:
        ray.get(pending)
    # mark links as sent only AFTER the shard acks: if delivery fails and
    # Ray retries this task on the same worker, the retry must re-ship the
    # un-acked offers (offers are idempotent, so re-sending is safe; a
    # pre-ack cache update would silently drop them instead)
    for link, key in best.items():
        prev_sent = sent.get(link)
        if prev_sent is None or key < prev_sent:
            sent[link] = key
    drop = [c for c in ("outlinks", "priority") if c in batch.column_names]
    return batch.drop_columns(drop)
