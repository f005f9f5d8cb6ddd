"""Cuckoo filter + frontier admission semantics (SURVEY.md ST1-ST3, O5)."""

import pickle

from webscraper_ray.state.cuckoo import CuckooFilter
from webscraper_ray.state.frontier_core import (
    FrontierCore,
    FrontierEntry,
    PolitenessConfig,
)


def test_cuckoo_basic_membership():
    cf = CuckooFilter(4096)
    keys = [f"https://h{i}.x/p{i}" for i in range(1000)]
    for k in keys:
        assert cf.add(k)
    assert all(cf.contains(k) for k in keys)
    misses = sum(cf.contains(f"https://other{i}.y/q") for i in range(10000))
    assert misses < 30  # fp rate ~0.012% expected; generous bound


def test_cuckoo_state_roundtrip():
    cf = CuckooFilter(1024)
    for i in range(100):
        cf.add(f"k{i}")
    cf2 = CuckooFilter.from_state(cf.state())
    assert all(cf2.contains(f"k{i}") for i in range(100))
    assert cf2.count == cf.count


def test_offer_outcomes():
    fc = FrontierCore(robots={"h.x": (["/private"], 0)})
    assert fc.offer("https://h.x/a") == "queued"
    assert fc.offer("https://h.x/a?utm_k=v") == "duplicate"  # canon collapses
    assert fc.offer("http://h.x/b") == "invalid"
    assert fc.offer("https://h.x/private/p") == "robots"
    assert fc.stats.queued == 1 and fc.stats.duplicate == 1
    assert fc.stats.invalid == 1 and fc.stats.robots_denied == 1


def test_pop_wave_budget_and_order():
    cfg = PolitenessConfig(window_ms=1000, per_host_cap=64)
    fc = FrontierCore(robots={"slow.x": ([], 500)}, cfg=cfg)  # budget 2/wave
    for i in range(5):
        fc.offer(f"https://slow.x/p{i}")
    for i in range(3):
        fc.offer(f"https://fast.x/p{i}", priority=1)
    wave1 = fc.pop_wave()
    urls = [e.canon_url for e in wave1]
    # slow.x capped at 2; fast.x all 3 (cap 64). Order: priority asc then url.
    assert urls == [
        "https://slow.x/p0", "https://slow.x/p1",
        "https://fast.x/p0", "https://fast.x/p1", "https://fast.x/p2",
    ]
    wave2 = fc.pop_wave()
    assert [e.canon_url for e in wave2] == [
        "https://slow.x/p2", "https://slow.x/p3",
    ]
    assert fc.pending() == 1


def test_admission_order_independent_of_offer_order():
    urls = [f"https://h{i % 4}.x/p{i}" for i in range(20)]
    a, b = FrontierCore(), FrontierCore()
    for u in urls:
        a.offer(u)
    for u in reversed(urls):
        b.offer(u)
    assert [e.canon_url for e in a.pop_wave()] == [e.canon_url for e in b.pop_wave()]


def test_requeue_retries_then_dead_letter():
    # crawlee maxRequestRetries=3: initial attempt + 3 retries = 4 attempts
    fc = FrontierCore()
    fc.offer("https://h.x/gone")
    [entry] = fc.pop_wave()
    assert fc.requeue_failure(entry, "fetch-miss")          # retry 1
    [e1] = fc.pop_wave()
    assert e1.retry == 1
    assert fc.requeue_failure(e1, "fetch-miss")             # retry 2
    [e2] = fc.pop_wave()
    assert fc.requeue_failure(e2, "fetch-miss")             # retry 3
    [e3] = fc.pop_wave()
    assert e3.retry == 3
    assert not fc.requeue_failure(e3, "fetch-miss")         # 4th failure -> dead
    assert fc.dead_letters == [("https://h.x/gone", "fetch-miss", 3)]


def test_extraction_failure_dead_letters_immediately():
    fc = FrontierCore()
    fc.offer("https://h.x/nohead")
    [entry] = fc.pop_wave()
    assert not fc.requeue_failure(entry, "not found")
    assert fc.dead_letters[0][1] == "not found"


def test_core_state_roundtrip_via_pickle():
    fc = FrontierCore(robots={"h.x": (["/p"], 100)})
    for i in range(10):
        fc.offer(f"https://h{i}.y/a")
    fc.pop_wave()
    fc.offer("https://late.z/b")
    blob = pickle.dumps(fc.state())
    fc2 = FrontierCore.from_state(pickle.loads(blob))
    assert fc2.pending() == fc.pending()
    assert fc2.offer("https://h0.y/a") == "duplicate"  # seen survives
    assert [e.canon_url for e in fc2.pop_wave()] == ["https://late.z/b"]


def test_entry_sort_key():
    a = FrontierEntry(0, 1, 0, "https://a/")
    b = FrontierEntry(0, 0, 0, "https://z/")
    c = FrontierEntry(1, 0, 0, "https://a/")
    assert sorted([c, a, b], key=lambda e: e.sort_key) == [b, a, c]


def test_min_key_wins_regardless_of_offer_order():
    # same url discovered from two parents with different priority/depth:
    # any arrival order must produce the same admitted entry (min key)
    a, b = FrontierCore(), FrontierCore()
    a.offer("https://h.x/p", priority=2, depth=5)
    a.offer("https://h.x/p", priority=0, depth=3)
    b.offer("https://h.x/p", priority=0, depth=3)
    b.offer("https://h.x/p", priority=2, depth=5)
    ea, eb = a.pop_wave(), b.pop_wave()
    assert ea == eb
    assert ea[0].priority == 0 and ea[0].depth == 3


def test_admitted_url_not_min_updated_by_late_offer():
    fc = FrontierCore()
    fc.offer("https://h.x/p", priority=1)
    [e] = fc.pop_wave()
    assert fc.offer("https://h.x/p", priority=0) == "duplicate"
    assert fc.pop_wave() == []  # nothing re-queued


def test_freshness_ttl_recrawl():
    # E16 analog: after ttl waves, a previously-admitted url may recrawl
    cfg = PolitenessConfig(freshness_ttl_waves=3)
    fc = FrontierCore(cfg=cfg)
    fc.offer("https://h.x/p")
    [e] = fc.pop_wave()                      # wave 0: admitted
    assert fc.offer("https://h.x/p") == "duplicate"   # fresh -> dedup
    assert fc.pop_wave() == []               # wave 1
    assert fc.pop_wave() == []               # wave 2
    assert fc.offer("https://h.x/p") == "queued"      # stale -> recrawl
    [e2] = fc.pop_wave()                     # wave 3: admitted again
    assert e2.canon_url == "https://h.x/p"
    assert fc.offer("https://h.x/p") == "duplicate"   # fresh again


def test_freshness_disabled_by_default():
    fc = FrontierCore()
    fc.offer("https://h.x/p")
    fc.pop_wave()
    for _ in range(10):
        fc.pop_wave()
    assert fc.offer("https://h.x/p") == "duplicate"


def test_freshness_state_survives_checkpoint():
    cfg = PolitenessConfig(freshness_ttl_waves=2)
    fc = FrontierCore(cfg=cfg)
    fc.offer("https://h.x/p")
    fc.pop_wave()
    fc2 = FrontierCore.from_state(pickle.loads(pickle.dumps(fc.state())))
    assert fc2.offer("https://h.x/p") == "duplicate"
    fc2.pop_wave(); fc2.pop_wave()
    assert fc2.offer("https://h.x/p") == "queued"


def test_cuckoo_auto_growth_never_drops_keys():
    """A filter driven far past its configured capacity must keep O(1)
    adds and 100% recall via the overflow chain (the 1M-page bench run
    saturated the 2^16 default into kick-chain storms + dropped keys);
    chain state survives checkpoint round-trip."""
    cf = CuckooFilter(1024)
    keys = [f"https://h{i % 37}.x/p/{i}" for i in range(10_000)]
    for k in keys:
        assert cf.add(k)
    assert cf.levels() > 1  # it DID outgrow the configured capacity
    assert cf.total_count() == len(keys)
    assert all(cf.contains(k) for k in keys)
    cf2 = CuckooFilter.from_state(cf.state())
    assert cf2.levels() == cf.levels()
    assert all(cf2.contains(k) for k in keys)


def test_cuckoo_growth_is_loud_in_shard_stats(ray_session):
    from webscraper_ray.state.frontier import FrontierShard

    import ray

    shard = FrontierShard.options(name="t_growth", namespace="t").remote(
        0, {}, PolitenessConfig(seen_capacity=256, exact_check=False)
    )
    offers = [(f"https://h.x/p/{i}", 1, 0) for i in range(2000)]
    ray.get(shard.offer_canonical_batch.remote(offers))
    stats = ray.get(shard.stats.remote())
    assert stats["seen_filter_levels"] > 1
    assert stats["queued"] == 2000
    ray.kill(shard)
