"""Skyline kernel — brute-force cross-check + duplicate semantics."""

import numpy as np

from webscraper_ray.functions.skyline import skyline_mask


def _brute(x, y):
    n = x.size
    keep = np.ones(n, dtype=bool)
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            if (
                x[j] >= x[i]
                and y[j] >= y[i]
                and (x[j] > x[i] or y[j] > y[i])
            ):
                keep[i] = False
                break
    return keep


def test_skyline_matches_bruteforce_on_random_grids():
    rng = np.random.RandomState(7)
    for trial in range(20):
        n = int(rng.randint(1, 60))
        # a coarse grid forces ties in each dim AND exact duplicate pairs
        x = rng.randint(0, 8, n).astype(np.int64)
        y = rng.randint(0, 8, n).astype(np.int64)
        got = skyline_mask(x, y)
        want = _brute(x, y)
        assert np.array_equal(got, want), (trial, x, y)


def test_exact_duplicates_of_a_skyline_point_all_survive():
    x = np.array([5, 5, 1], dtype=np.int64)
    y = np.array([5, 5, 9], dtype=np.int64)
    m = skyline_mask(x, y)
    assert m.tolist() == [True, True, True]


def test_dominated_point_dropped_even_with_one_tied_dim():
    # (5,5) dominates (5,4) (tie on x, strict on y)
    x = np.array([5, 5], dtype=np.int64)
    y = np.array([5, 4], dtype=np.int64)
    assert skyline_mask(x, y).tolist() == [True, False]
