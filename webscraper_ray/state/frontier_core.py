"""Frontier semantics: URL-seen, robots, politeness, priority admission.

ONE implementation shared by the single-process oracle simulator
(``webscraper_ray.oracle.crawl_sim``) and the Ray shard actors
(``webscraper_ray.state.frontier``): the distributed pipeline and the
oracle agree on admission semantics *by construction*, and the parity
tests then only have to establish that sharding + parallel execution
preserve them (BASELINE.md: URL-seen set ≡ oracle, crawl order ≡ oracle).

Reference mapping (SURVEY.md §2.4, §4):
- URL-seen (ST1): crawlee RequestQueue dedup on uniqueKey + ScyllaDB
  freshness rows -> cuckoo filter + exact fallback set, keyed by the
  canonical URL (``canon.canonicalize``).
- Scrape lock / in-flight (ST3): per-wave admission — a URL admitted into
  wave k is owned by that wave; failures re-enqueue with retry_count+1 up
  to 3 (crawlee's default maxRequestRetries, ``src/crawler.ts:30,87-96``)
  then dead-letter.
- Politeness (ST2 / north_rule): per-host token budget per wave =
  clamp(window_ms / crawl_delay_ms, 1, per_host_cap); robots disallow
  prefixes filter at offer time. The reference has neither (single-URL
  service, crawlee defaults); budgets are the north_rule's addition.

Deterministic ordering contract: a wave admits, per host, the
lexicographically smallest ``(priority, depth, retry, canon_url)`` entries
up to the host budget; the wave's global crawl order is the sorted union
of all admitted entries. Both are independent of shard count and of
arrival order of ``offer()`` batches *within* a wave — the properties the
determinism tests pin. To make that hold when the same URL is discovered
from several parents concurrently (different priority/depth), a pending
URL keeps the MINIMUM sort key over all offers (min is commutative, so
any offer arrival order yields the same frontier), rather than
first-offer-wins which would depend on scheduling.
"""

from __future__ import annotations

import heapq
from dataclasses import dataclass


from ..oracle.canon import canonicalize, host_of, is_valid_url
from .cuckoo import CuckooFilter

__all__ = ["PolitenessConfig", "FrontierEntry", "FrontierCore", "OfferStats"]

MAX_RETRIES = 3  # crawlee default maxRequestRetries (src/crawler.ts:30)


@dataclass(frozen=True)
class PolitenessConfig:
    window_ms: int = 1000      # politeness window represented by one wave
    per_host_cap: int = 64     # admission cap per host per wave (delay 0)
    seen_capacity: int = 1 << 16  # cuckoo capacity per shard (test scale)
    exact_check: bool = True   # keep exact set + assert agreement (test scale)
    # E16 freshness window (src/db/model.ts:45-50: 3-day recrawl TTL): a
    # URL admitted >= ttl waves ago may be offered and crawled again; its
    # new doc row coexists with the old one and latest-per-url reads pick
    # the newest id (A3), exactly the reference's multiple-rows-per-url
    # model. 0 = never recrawl. At 1e10 scale the per-url admission wave
    # is held as rotating-generation cuckoo filters (one filter per TTL
    # epoch, retire the oldest); at test scale an exact dict.
    freshness_ttl_waves: int = 0

    def host_budget(self, crawl_delay_ms: int) -> int:
        if crawl_delay_ms <= 0:
            return self.per_host_cap
        return max(1, min(self.per_host_cap, self.window_ms // crawl_delay_ms))


@dataclass(frozen=True)
class FrontierEntry:
    priority: int
    depth: int
    retry: int
    canon_url: str

    @property
    def sort_key(self) -> tuple:
        return (self.priority, self.depth, self.retry, self.canon_url)


@dataclass
class OfferStats:
    queued: int = 0
    duplicate: int = 0
    invalid: int = 0
    robots_denied: int = 0
    # cuckoo add() failures (filter saturated; URL not recorded as seen)
    filter_overflow: int = 0

    def merge(self, other: "OfferStats") -> None:
        self.queued += other.queued
        self.duplicate += other.duplicate
        self.invalid += other.invalid
        self.robots_denied += other.robots_denied
        self.filter_overflow += other.filter_overflow


class FrontierCore:
    """Seen-filter + robots + priority heap for one shard (or the whole
    frontier when used by the oracle with a single instance)."""

    def __init__(
        self,
        robots: dict[str, tuple[list[str], int]] | None = None,
        cfg: PolitenessConfig | None = None,
    ):
        self.cfg = cfg or PolitenessConfig()
        self.robots = robots or {}
        self.seen_filter = CuckooFilter(self.cfg.seen_capacity)
        self.seen_exact: set[str] | None = set() if self.cfg.exact_check else None
        # canon_url -> (priority, depth, retry) while queued (not yet admitted);
        # the heap may hold stale keys (lazy deletion on pop)
        self.pending_keys: dict[str, tuple[int, int, int]] = {}
        self.heap: list[tuple] = []  # (sort_key, canon_url)
        self.stats = OfferStats()
        # exact count of distinct URLs recorded as seen — a counter, not a
        # gathered set, so it is cheap to report at any scale (the exact
        # set itself exists only in exact_check test mode)
        self.seen_count = 0
        self.dead_letters: list[tuple[str, str, int]] = []  # (canon_url, reason, retry)
        self.current_wave = 0
        # canon_url -> wave of last admission (freshness bookkeeping;
        # only maintained when a TTL is configured)
        self.admitted_wave: dict[str, int] = {}

    # --- seen filter ------------------------------------------------------

    def _test_and_set_seen(self, canon_url: str) -> bool:
        """True if already seen; records it otherwise."""
        hit = self.seen_filter.contains(canon_url)
        if self.seen_exact is not None:
            exact_hit = canon_url in self.seen_exact
            # a cuckoo false positive would silently drop a URL; at test
            # scale we trust the exact set and surface the divergence
            if hit and not exact_hit:
                hit = False
            self.seen_exact.add(canon_url)
        if not hit:
            recorded = self.seen_filter.add(canon_url)
            if not recorded:
                # over-capacity: the URL was NOT recorded, so dedup for it
                # is broken until the operator resizes/reshards. Count it
                # (visible in stats()/shard stats) instead of failing
                # silently — a saturated filter would otherwise re-admit
                # crawled URLs forever.
                self.stats.filter_overflow += 1
            # count only URLs actually recorded as seen (in exact mode the
            # exact set records it regardless of filter overflow): an
            # unrecorded URL will be offered and counted again later, and
            # counting it now would inflate seen_count on every re-offer
            if recorded or self.seen_exact is not None:
                self.seen_count += 1
        return hit

    # --- offers -----------------------------------------------------------

    def offer(self, raw_url: str, priority: int = 0, depth: int = 0) -> str:
        """Outcome: 'queued' | 'duplicate' | 'invalid' | 'robots'.

        A URL still pending keeps the minimum (priority, depth) over all
        offers — commutative, hence independent of offer arrival order.
        A URL already admitted (or dead-lettered) is a duplicate.
        """
        if not is_valid_url(raw_url):
            self.stats.invalid += 1
            return "invalid"
        try:
            canon = canonicalize(raw_url)
        except ValueError:
            self.stats.invalid += 1
            return "invalid"
        return self.offer_canonical(canon, priority, depth)

    def offer_canonical(self, canon: str, priority: int = 0, depth: int = 0) -> str:
        """offer() after validation+canonicalization. Exposed so the
        (parallel, CPU-scaled) route stage can canonicalize and the
        (serialized, per-shard) actor only does robots+seen+heap work —
        canonicalization in the actor would cap offer throughput at the
        shard count. canonicalize() is idempotent, so feeding already-
        canonical URLs through either path is equivalent.

        Host/path are sliced directly from the canonical form
        (``scheme://host[/path]``, host already lowercased) — this is the
        per-offer hot path of every shard actor and a full urlsplit here
        measurably caps frontier throughput.
        """
        scheme_end = canon.find("://") + 3
        path_start = canon.find("/", scheme_end)
        if path_start == -1:
            host, path = canon[scheme_end:], "/"
        else:
            host, path = canon[scheme_end:path_start], canon[path_start:]
        at = host.rfind("@")
        if at != -1:
            host = host[at + 1 :]
        colon = host.rfind(":")
        if colon != -1:
            host = host[:colon]
        rules = self.robots.get(host)
        if rules:
            q = path.find("?")
            path_only = path[:q] if q != -1 else path
            if any(path_only.startswith(p) for p in rules[0] if p):
                self.stats.robots_denied += 1
                return "robots"
        if self._test_and_set_seen(canon):
            key = self.pending_keys.get(canon)
            # min-update while queued and not a retry entry
            if key is not None and key[2] == 0 and (priority, depth) < key[:2]:
                self.pending_keys[canon] = (priority, depth, 0)
                heapq.heappush(self.heap, ((priority, depth, 0, canon), canon))
                self.stats.duplicate += 1
                return "duplicate"
            # E16 freshness: a stale previously-admitted URL is re-queued
            ttl = self.cfg.freshness_ttl_waves
            if (
                ttl > 0
                and key is None
                and self.current_wave - self.admitted_wave.get(canon, self.current_wave)
                >= ttl
            ):
                self.pending_keys[canon] = (priority, depth, 0)
                heapq.heappush(self.heap, ((priority, depth, 0, canon), canon))
                self.stats.queued += 1
                return "queued"
            self.stats.duplicate += 1
            return "duplicate"
        self.pending_keys[canon] = (priority, depth, 0)
        heapq.heappush(self.heap, ((priority, depth, 0, canon), canon))
        self.stats.queued += 1
        return "queued"

    def requeue_failure(self, entry: FrontierEntry, reason: str) -> bool:
        """Fetch failure: retry with retry+1 up to MAX_RETRIES retries
        (crawlee's maxRequestRetries=3 allows 3 retries after the initial
        attempt = 4 attempts total), else dead-letter. Extraction failures
        dead-letter immediately (the reference's requestHandler reject is
        final; only transport errors retry — src/crawler.ts:87-96)."""
        if reason == "not found" or entry.retry + 1 > MAX_RETRIES:
            self.dead_letters.append((entry.canon_url, reason, entry.retry))
            return False
        key = (entry.priority, entry.depth, entry.retry + 1)
        self.pending_keys[entry.canon_url] = key
        heapq.heappush(self.heap, (key + (entry.canon_url,), entry.canon_url))
        return True

    # --- admission --------------------------------------------------------

    def pop_wave(self) -> list[FrontierEntry]:
        """Admit up to budget(host) entries per host, smallest sort-key
        first; left-overs stay queued for later waves. Returns entries in
        global deterministic order (sorted by sort_key)."""
        admitted: list[FrontierEntry] = []
        leftover: list[tuple] = []
        budget_left: dict[str, int] = {}
        while self.heap:
            key, canon = heapq.heappop(self.heap)
            current = self.pending_keys.get(canon)
            if current is None or key[:3] != current:
                continue  # stale heap entry (min-updated or already admitted)
            host = host_of(canon)
            if host not in budget_left:
                rules = self.robots.get(host)
                budget_left[host] = self.cfg.host_budget(rules[1] if rules else 0)
            if budget_left[host] > 0:
                budget_left[host] -= 1
                del self.pending_keys[canon]
                if self.cfg.freshness_ttl_waves > 0:
                    self.admitted_wave[canon] = self.current_wave
                admitted.append(FrontierEntry(key[0], key[1], key[2], canon))
            else:
                leftover.append((key, canon))
        for item in leftover:
            heapq.heappush(self.heap, item)
        self.current_wave += 1
        admitted.sort(key=lambda e: e.sort_key)
        return admitted

    # --- staged admission (driverless wave flow) --------------------------
    #
    # stage_wave/admit_staged split pop_wave so a GLOBAL wave-size cap can
    # be applied without the driver ever holding entries: shards stage
    # locally (sorted), the driver runs a distributed K-th-key selection
    # over O(shards)-sized messages, and each shard admits its keys <=
    # threshold (the same "globally smallest K" rule as the driver-side
    # cap, so admissions stay a pure function of the pending state).

    def stage_wave(self) -> int:
        """Politeness-admit into a local staged buffer; returns count."""
        self.staged: list[FrontierEntry] = self.pop_wave()
        return len(self.staged)

    def staged_key_at(self, rank: int) -> tuple:
        return self.staged[rank].sort_key

    def staged_count_le(self, key: tuple) -> int:
        import bisect

        return bisect.bisect_right([e.sort_key for e in self.staged], key)

    def staged_keys_slice(self, lo: int, hi: int) -> list[tuple]:
        return [e.sort_key for e in self.staged[lo:hi]]

    def admit_staged(self, threshold_key: tuple | None = None) -> list[FrontierEntry]:
        """Admit staged entries (all, or those with key <= threshold);
        the truncated tail is restored and competes next wave."""
        staged = getattr(self, "staged", [])
        self.staged = []
        if threshold_key is None:
            return staged
        import bisect

        cut = bisect.bisect_right([e.sort_key for e in staged], threshold_key)
        self.restore_pending(staged[cut:])
        return staged[:cut]

    def restore_pending(self, entries: list[FrontierEntry]) -> None:
        """Put admitted-but-truncated entries back in the queue (global
        wave-size cap support): they keep their keys and compete again
        next wave. Deterministic — the caller truncates the SORTED merged
        admission, so which entries come back is a pure function of the
        pending set."""
        for e in entries:
            key = (e.priority, e.depth, e.retry)
            self.pending_keys[e.canon_url] = key
            heapq.heappush(self.heap, (key + (e.canon_url,), e.canon_url))

    def pending(self) -> int:
        return len(self.pending_keys)

    # --- checkpointing ----------------------------------------------------

    def state(self) -> dict:
        return {
            "cfg": self.cfg,
            "robots": self.robots,
            "filter": self.seen_filter.state(),
            "exact": set(self.seen_exact) if self.seen_exact is not None else None,
            "pending": dict(self.pending_keys),
            "stats": OfferStats(**vars(self.stats)),
            "seen_count": self.seen_count,
            "dead": list(self.dead_letters),
            "current_wave": self.current_wave,
            "admitted_wave": dict(self.admitted_wave),
        }

    @classmethod
    def from_state(cls, state: dict) -> "FrontierCore":
        obj = cls.__new__(cls)
        obj.cfg = state["cfg"]
        obj.robots = state["robots"]
        obj.seen_filter = CuckooFilter.from_state(state["filter"])
        obj.seen_exact = set(state["exact"]) if state["exact"] is not None else None
        obj.pending_keys = dict(state["pending"])
        obj.heap = [(key + (canon,), canon) for canon, key in obj.pending_keys.items()]
        heapq.heapify(obj.heap)
        obj.stats = OfferStats(**vars(state["stats"]))
        obj.seen_count = state.get("seen_count", 0)
        obj.dead_letters = list(state["dead"])
        obj.current_wave = state.get("current_wave", 0)
        obj.admitted_wave = dict(state.get("admitted_wave", {}))
        return obj
