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

    def __init__(
        self,
        shard_id: int,
        robots: dict,
        cfg: PolitenessConfig | None = None,
        *,
        static_store: bool = True,
        fetch_buckets: int = 0,
    ):
        self.shard_id = shard_id
        self.core = FrontierCore(robots=robots, cfg=cfg)
        self._status: list[tuple[str, bool, str]] = []
        # staged-wave bookkeeping (driverless flow)
        self._wave_admitted: list[FrontierEntry] = []
        self._wave_fetchable: dict[str, FrontierEntry] = {}
        self._wave_missing: list[FrontierEntry] = []
        # Fetch-miss fast path: against a STATIC page store a retry of a
        # missing URL can never succeed, so misses are remembered and
        # skip the fetch pipeline. Against a real network fetcher a miss
        # may be transient (timeout, 5xx) — the documented retry contract
        # requires re-contacting the server, so the fast path is gated on
        # static_store (run_crawl sets it from the fetcher type).
        self._static_store = static_store
        self._known_missing: set[str] = set()
        # page-store bucket count: >0 makes _publish_wave attach each
        # fetchable URL's store bucket so the fetch-cache shards filter
        # vectorized instead of re-hashing every URL pool_size times
        self._fetch_buckets = fetch_buckets

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

    # --- staged (driverless) wave flow -----------------------------------

    def stage_wave(self) -> int:
        return self.core.stage_wave()

    def staged_key_at(self, rank: int) -> tuple:
        return self.core.staged_key_at(rank)

    def staged_count_le(self, key: tuple) -> int:
        return self.core.staged_count_le(key)

    def staged_keys_slice(self, lo: int, hi: int) -> list[tuple]:
        return self.core.staged_keys_slice(lo, hi)

    def _publish_wave(self, record_order: bool) -> dict:
        """Split this shard's admitted wave into fetchable vs known-
        missing and publish the fetchable (url, depth, priority) rows as
        ONE small Arrow table in the object store; the driver only ever
        sees {count, ref, order?}. Known-missing URLs (static page
        store: a retry can never succeed) are requeued in finish_wave —
        deferring the retry bump keeps optimistic admission truncatable
        without touching retry counts."""
        admitted = self._wave_admitted
        missing = self._known_missing
        fetchable = [e for e in admitted if e.canon_url not in missing]
        self._wave_fetchable = {e.canon_url: e for e in fetchable}
        self._wave_missing = [e for e in admitted if e.canon_url in missing]
        ref = None
        if fetchable:
            cols = {
                "url": pa.array([e.canon_url for e in fetchable], pa.string()),
                "depth": pa.array([e.depth for e in fetchable], pa.int32()),
                "priority": pa.array([e.priority for e in fetchable], pa.int32()),
            }
            if self._fetch_buckets:
                # computed ONCE here (per URL per wave) instead of once
                # per fetch-cache shard downstream
                from ..stages.fetch import bucket_of

                cols["bucket"] = pa.array(
                    [bucket_of(e.canon_url, self._fetch_buckets) for e in fetchable],
                    pa.int32(),
                )
            ref = ray.put(pa.table(cols))
        out = {
            "count": len(admitted),
            "skipped_missing": len(admitted) - len(fetchable),
            "ref": ref,
        }
        if record_order:
            out["order"] = [(e.sort_key, e.canon_url) for e in admitted]
        return out

    def stage_and_admit_all(self, record_order: bool) -> dict:
        """ONE-round optimistic admission: stage + admit everything and
        publish. When the global wave cap is exceeded the driver follows
        up with K-th-key selection over the (sorted) admitted lists and
        ``truncate_admitted`` — the extra rounds are paid ONLY by capped
        waves."""
        self.core.stage_wave()
        self._wave_admitted = self.core.admit_staged(None)
        return self._publish_wave(record_order)

    def admit_staged(
        self, threshold_key: tuple | None, record_order: bool
    ) -> dict:
        """Two-round admission (staging already done via stage_wave)."""
        self._wave_admitted = self.core.admit_staged(threshold_key)
        return self._publish_wave(record_order)

    def admitted_key_at(self, rank: int) -> tuple:
        return self._wave_admitted[rank].sort_key

    def admitted_count_le(self, key: tuple) -> int:
        import bisect

        return bisect.bisect_right(
            [e.sort_key for e in self._wave_admitted], key
        )

    def admitted_keys_slice(self, lo: int, hi: int) -> list[tuple]:
        return [e.sort_key for e in self._wave_admitted[lo:hi]]

    def truncate_admitted(self, threshold_key: tuple, record_order: bool) -> dict:
        """Global-cap clawback for the optimistic path: entries with key
        > threshold go back to pending (retry counts untouched — the
        known-missing requeue is deferred to finish_wave) and the
        fetchable table is republished."""
        import bisect

        keep = bisect.bisect_right(
            [e.sort_key for e in self._wave_admitted], threshold_key
        )
        self.core.restore_pending(self._wave_admitted[keep:])
        self._wave_admitted = self._wave_admitted[:keep]
        return self._publish_wave(record_order)

    def unstage_wave(self) -> int:
        """Return a staged-but-never-run wave's entries to pending (the
        run hit max_waves after the fused turnaround staged one more)."""
        n = len(self._wave_admitted)
        self.core.restore_pending(self._wave_admitted)
        self._wave_admitted = []
        self._wave_fetchable = {}
        self._wave_missing = []
        return n

    def finish_wave(self) -> dict:
        """After the wave's pipeline: requeue this wave's known-missing
        entries, compare admitted fetchables against the status rows the
        route stage pushed here, requeue misses/errors locally, and
        return ONLY counts."""
        status: dict[str, tuple[bool, str]] = {}
        for url, ok, err in self._status:
            status[url] = (ok, err)
        self._status = []
        fetchable = self._wave_fetchable
        missing = self._known_missing
        fetched = ok_count = failures = 0
        for e in getattr(self, "_wave_missing", []):
            failures += 1
            self.core.requeue_failure(e, "fetch-miss")
        for url, entry in fetchable.items():
            st = status.get(url)
            if st is None:
                failures += 1
                if self._static_store:
                    missing.add(url)
                self.core.requeue_failure(entry, "fetch-miss")
            else:
                fetched += 1
                ok, err = st
                if ok:
                    ok_count += 1
                else:
                    failures += 1
                    self.core.requeue_failure(entry, err or "error")
        self._wave_admitted = []
        self._wave_fetchable = {}
        self._wave_missing = []
        return {"fetched": fetched, "ok": ok_count, "failures": failures}

    def finish_checkpoint_stage(
        self, ckpt_path: str | None, record_order: bool
    ) -> dict:
        """ONE control message for the whole inter-wave turnaround:
        finish wave k (requeue misses), checkpoint post-finish state
        (before staging pops entries off the pending heap — restore
        must re-admit wave k+1 from scratch), then stage + admit wave
        k+1 optimistically. Replaces three driver->shards barriers with
        one; the global-cap clawback round (truncate_admitted) still
        follows only on capped waves."""
        finish = self.finish_wave()
        if ckpt_path:
            self.checkpoint(ckpt_path)
        return {"finish": finish, "stage": self.stage_and_admit_all(record_order)}

    def requeue_batch(self, failures: list[tuple[FrontierEntry, str]]) -> int:
        return sum(self.core.requeue_failure(e, reason) for e, reason in failures)

    def pending(self) -> int:
        return self.core.pending()

    def stats(self) -> dict:
        return vars(self.core.stats) | {
            "pending": self.core.pending(),
            "dead_letters": len(self.core.dead_letters),
            # seen-filter chain length; > 1 means the shard outgrew its
            # configured seen_capacity and auto-grew (resize deliberately)
            "seen_filter_levels": self.core.seen_filter.levels(),
        }

    def dead_letters(self) -> list[tuple[str, str, int]]:
        return list(self.core.dead_letters)

    def seen_urls(self) -> set[str]:
        """Exact seen set — test scale only (exact_check mode)."""
        return set(self.core.seen_exact or ())

    def seen_count(self) -> int:
        return self.core.seen_count

    def checkpoint(self, path: str) -> str:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        state = self.core.state()
        # shard-level (non-core) state: known-missing URLs skip the fetch
        # pipeline on retries; persisting them keeps resumed runs on the
        # fast path instead of re-missing once per URL
        state["known_missing"] = set(self._known_missing)
        with open(tmp, "wb") as f:
            pickle.dump(state, f)
        os.replace(tmp, path)  # atomic publish
        return path

    def restore(self, path: str) -> int:
        with open(path, "rb") as f:
            state = pickle.load(f)
        self._known_missing = set(state.pop("known_missing", ()))
        self.core = FrontierCore.from_state(state)
        return self.core.pending()


class ShardedFrontier:
    """Driver-side facade over the named shard actors."""

    def __init__(
        self,
        num_shards: int,
        robots: dict[str, tuple[list[str], int]],
        cfg: PolitenessConfig | None = None,
        *,
        static_store: bool = True,
        fetch_buckets: int = 0,
        cpu_share: float = 0.0,
    ):
        self.num_shards = num_shards
        # robots rules are sharded BY HOST like everything else (north
        # rule: robots cache keyed by host): each shard holds only its own
        # hosts' rules, so robots state scales horizontally instead of
        # being replicated num_shards times
        robots_by_shard: list[dict] = [{} for _ in range(num_shards)]
        for host, rules in robots.items():
            robots_by_shard[shard_of_host(host, num_shards)][host] = rules
        # cpu_share > 0 books each shard's work INSIDE the session's CPU
        # budget (on a real cluster the frontier runs on the same nodes
        # as the data stages); num_cpus=0 keeps the test default of
        # lightweight state holders that never block task scheduling
        self.shards = [
            FrontierShard.options(num_cpus=cpu_share).remote(
                i,
                robots_by_shard[i],
                cfg,
                static_store=static_store,
                fetch_buckets=fetch_buckets,
            )
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

    # --- staged (driverless) wave flow -----------------------------------

    def _select_threshold(self, counts: list[int], k: int) -> tuple:
        """Exact global K-th smallest admitted sort key across shards.

        Distributed selection over the shards' locally-sorted admitted
        lists: every round moves O(shards) keys/counts to the driver
        (never entries), narrowing per-shard candidate windows until the
        remainder is small enough to gather (< 4 keys per shard). Keys
        are unique (canon_url is part of the key), so the K-th key is
        exact and admissions stay deterministic."""
        n = len(self.shards)
        lo = [0] * n
        hi = list(counts)
        for _ in range(256):
            windows = [hi[i] - lo[i] for i in range(n)]
            total = sum(windows)
            if total <= 4 * n:
                break
            # pivot = mid key of the shard with the largest window
            big = max(range(n), key=lambda i: windows[i])
            pivot = ray.get(
                self.shards[big].admitted_key_at.remote((lo[big] + hi[big]) // 2)
            )
            below = ray.get(
                [s.admitted_count_le.remote(pivot) for s in self.shards]
            )
            c = sum(below)
            if c >= k:
                hi = [min(hi[i], below[i]) for i in range(n)]
            else:
                lo = [max(lo[i], below[i]) for i in range(n)]
        # gather the small remainder and pick exactly
        slices = ray.get(
            [
                s.admitted_keys_slice.remote(lo[i], hi[i])
                for i, s in enumerate(self.shards)
            ]
        )
        rest = sorted(key for part in slices for key in part)
        k_into_rest = k - sum(lo)
        assert 1 <= k_into_rest <= len(rest), (k, sum(lo), len(rest))
        return rest[k_into_rest - 1]

    def stage_and_admit(
        self, max_wave_size: int = 0, record_order: bool = False
    ) -> dict:
        """Driverless wave admission, ONE control round in the common
        case: shards stage + admit optimistically and publish refs; only
        when the cap is exceeded does the driver run the K-th-key
        selection and a truncate sweep (the clawback restores over-cap
        entries with retry counts untouched). Returns {count, refs,
        order} where refs are per-shard Arrow tables of fetchable (url,
        depth, priority) rows living in the object store — the driver
        holds O(shards) control data only (plus the order list in
        record_order parity/test mode)."""
        results = ray.get(
            [s.stage_and_admit_all.remote(record_order) for s in self.shards]
        )
        return self._finalize_admission(results, max_wave_size, record_order)

    def _finalize_admission(
        self, results: list[dict], max_wave_size: int, record_order: bool
    ) -> dict:
        """Aggregate the shards' optimistic admissions; run the K-th-key
        cap clawback only when the global cap is exceeded."""
        counts = [r["count"] for r in results]
        total = sum(counts)
        if total == 0:
            return {"count": 0, "refs": [], "order": []}
        if max_wave_size and total > max_wave_size:
            threshold = self._select_threshold(counts, max_wave_size)
            results = ray.get(
                [
                    s.truncate_admitted.remote(threshold, record_order)
                    for s in self.shards
                ]
            )
        out = {
            "count": sum(r["count"] for r in results),
            "skipped_missing": sum(r["skipped_missing"] for r in results),
            "refs": [r["ref"] for r in results if r["ref"] is not None],
        }
        if record_order:
            merged = sorted(
                item for r in results for item in r.get("order", [])
            )
            out["order"] = [url for _key, url in merged]
        return out

    def finish_checkpoint_stage(
        self,
        ckpt_dir: str | None,
        wave: int,
        max_wave_size: int = 0,
        record_order: bool = False,
    ) -> tuple[dict, dict]:
        """Fused inter-wave turnaround: finish wave ``wave``, checkpoint
        it, and stage+admit the next wave in ONE barrier (each shard
        pipelines its own finish->checkpoint->stage sequence; the driver
        waits once instead of three times). Returns (finish_totals,
        next_admission)."""
        paths = (
            [
                os.path.join(ckpt_dir, f"wave_{wave}", f"shard_{i}.pkl")
                for i in range(self.num_shards)
            ]
            if ckpt_dir
            else [None] * self.num_shards
        )
        results = ray.get(
            [
                s.finish_checkpoint_stage.remote(p, record_order)
                for s, p in zip(self.shards, paths)
            ]
        )
        finish = {
            k: sum(r["finish"][k] for r in results)
            for k in ("fetched", "ok", "failures")
        }
        admission = self._finalize_admission(
            [r["stage"] for r in results], max_wave_size, record_order
        )
        return finish, admission

    def finish_wave(self) -> dict:
        parts = ray.get([s.finish_wave.remote() for s in self.shards])
        return {
            k: sum(p[k] for p in parts) for k in ("fetched", "ok", "failures")
        }

    def unstage_wave(self) -> int:
        return sum(ray.get([s.unstage_wave.remote() for s in self.shards]))

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

    def seen_count(self) -> int:
        """Exact distinct-seen count — O(shards) integers, works in both
        cuckoo and exact modes (unlike seen_urls, which gathers the set
        and exists for test-scale parity only)."""
        return sum(ray.get([s.seen_count.remote() for s in self.shards]))

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
