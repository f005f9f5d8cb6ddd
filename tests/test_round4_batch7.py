"""Property tests for the seventh/eighth-batch pure kernels (no Ray):
the vectorized basket-pair emission, the isqrt outlier-boundary
equivalence, and the BFS depth semantics the `reachable_docs` oracle
relies on."""

from __future__ import annotations

import itertools
import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from webscraper_ray.queries import basket_pair_arrays


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 12)),
        min_size=0,
        max_size=60,
    )
)
def test_basket_pairs_match_bruteforce(rows):
    gk = np.array([g for g, _ in rows], dtype=np.int64)
    it = np.array([i for _, i in rows], dtype=np.int64)
    a, b = basket_pair_arrays(gk, it)
    got = sorted(zip(a.tolist(), b.tolist()))
    # brute force: per group, distinct items, all unordered pairs
    want = []
    groups: dict[int, set] = {}
    for g, i in rows:
        groups.setdefault(g, set()).add(i)
    for items in groups.values():
        for x, y in itertools.combinations(sorted(items), 2):
            want.append((x, y))
    assert got == sorted(want)
    assert np.all(a < b) if a.size else True


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(0, 5000), min_size=2, max_size=50),
)
def test_isqrt_bound_equals_quadratic(cents):
    """|n*x - sx| > isqrt(9*(n*sx2 - sx^2))  <=>  (n*x-sx)^2 > 9*(...)."""
    n = len(cents)
    sx = sum(cents)
    sx2 = sum(c * c for c in cents)
    tau2 = 9 * (n * sx2 - sx * sx)
    bound = math.isqrt(tau2)
    for x in cents:
        d = n * x - sx
        assert (abs(d) > bound) == (d * d > tau2)


def test_basket_pairs_folds_duplicates():
    gk = np.array([1, 1, 1, 1], dtype=np.int64)
    it = np.array([7, 7, 3, 3], dtype=np.int64)
    a, b = basket_pair_arrays(gk, it)
    assert list(zip(a, b)) == [(3, 7)]


def test_basket_pairs_single_item_groups():
    gk = np.arange(10, dtype=np.int64)
    it = np.zeros(10, dtype=np.int64)
    a, b = basket_pair_arrays(gk, it)
    assert a.size == 0 and b.size == 0


def test_isin_sorted_edges():
    from webscraper_ray.queries import _isin_sorted

    v = np.array([1, 5, 9], dtype=np.int64)
    # empty reference: all False, no out-of-bounds index
    assert not _isin_sorted(v, np.array([], dtype=np.int64)).any()
    ref = np.array([0, 5, 7], dtype=np.int64)
    assert _isin_sorted(v, ref).tolist() == [False, True, False]
    # value beyond the last reference element (the clamp branch)
    assert _isin_sorted(np.array([100], dtype=np.int64), ref).tolist() == [False]
    assert _isin_sorted(np.array([7], dtype=np.int64), ref).tolist() == [True]


def test_xor_mix_parts_properties():
    from webscraper_ray.functions.dedup import xor_mix_parts

    a = np.arange(10_000, dtype=np.int64)
    b = (a * 7 + 3) % 9973
    p = xor_mix_parts([a, b], 16)
    assert p.dtype == np.int32 and p.min() >= 0 and p.max() < 16
    # deterministic
    assert np.array_equal(p, xor_mix_parts([a, b], 16))
    # column order matters (asymmetric mix) and spread is balanced
    assert not np.array_equal(p, xor_mix_parts([b, a], 16))
    counts = np.bincount(p, minlength=16)
    assert counts.min() > 0.5 * counts.mean()


def test_basket_pairs_giant_basket_guard():
    import pytest

    gk = np.zeros(100, dtype=np.int64)
    it = np.arange(100, dtype=np.int64)
    with pytest.raises(ValueError, match="group 0 has 100 distinct items"):
        basket_pair_arrays(gk, it, max_basket=50)
    # at the cap: no raise
    a, b = basket_pair_arrays(gk, it, max_basket=100)
    assert a.size == 100 * 99 // 2
