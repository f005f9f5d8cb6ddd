"""Units for the edit-distance-1 join and the triangle counter."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from webscraper_ray.functions.editdist import edit1_pairs, edit_le1
from webscraper_ray.functions.graph import triangle_count


@pytest.mark.parametrize(
    "a,b,want",
    [
        ("abc", "abc", True),  # equal
        ("abc", "adc", True),  # substitution
        ("abc", "abcd", True),  # insertion at end
        ("abc", "xabc", True),  # insertion at front
        ("abcd", "abd", True),  # deletion
        ("abc", "axy", False),  # two substitutions
        ("abc", "abcde", False),  # length diff 2
        ("", "a", True),
        ("", "", True),
        ("ab", "ba", False),  # transposition is distance 2 here
    ],
)
def test_edit_le1(a, b, want):
    assert edit_le1(a, b) is want
    assert edit_le1(b, a) is want


def _brute_pairs(rows):
    def lev_le1(a, b):
        # independent O(L^2) DP, capped check
        la, lb = len(a), len(b)
        if abs(la - lb) > 1:
            return False
        prev = list(range(lb + 1))
        for i in range(1, la + 1):
            cur = [i] + [0] * lb
            for j in range(1, lb + 1):
                cur[j] = min(
                    prev[j] + 1,
                    cur[j - 1] + 1,
                    prev[j - 1] + (a[i - 1] != b[j - 1]),
                )
            prev = cur
        return prev[lb] <= 1

    out = set()
    for i, (ia, na) in enumerate(rows):
        for ib, nb in rows[i + 1 :]:
            if lev_le1(na, nb):
                out.add((min(ia, ib), max(ia, ib)))
    return sorted(out)


def test_edit1_pairs_matches_bruteforce(ray_session):
    rows = [
        (1, "cold widget"),
        (2, "bold widget"),  # sub of 1
        (3, "cold widgets"),  # ins of 1
        (4, "cold widget"),  # exact dup of 1
        (5, "old widget"),  # del of 1
        (6, "warm gasket"),
        (7, "warm gasket"),  # dup of 6
        (8, "warm basket"),  # sub of 6
        (9, "entirely other"),
        (10, "wxrm gasket"),  # sub of 6, distance 2 from 8
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array([r[0] for r in rows], pa.int64()),
                "name": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )
    got = edit1_pairs(ds, "id", "name").to_pandas()
    got_pairs = sorted(zip(got["id_a"], got["id_b"]))
    assert got_pairs == _brute_pairs(rows)


def test_edit1_bucket_cap_raises(ray_session):
    n = 6
    ds = ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array(list(range(n)), pa.int64()),
                "name": pa.array(["same name"] * n, pa.string()),
            }
        )
    )
    with pytest.raises(Exception, match="bucket"):
        edit1_pairs(ds, "id", "name", bucket_cap=4).materialize()


def _edges_ds(pairs):
    a = [min(p) for p in pairs]
    b = [max(p) for p in pairs]
    return ray.data.from_arrow(
        pa.table({"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())})
    )


def test_triangle_count_known_graphs(ray_session):
    # two triangles sharing edge (1,2): {1,2,3} and {1,2,4}
    tri2 = [(1, 2), (1, 3), (2, 3), (1, 4), (2, 4)]
    assert triangle_count(_edges_ds(tri2), num_partitions=4) == 2
    # a 4-cycle has no triangle
    square = [(1, 2), (2, 3), (3, 4), (1, 4)]
    assert triangle_count(_edges_ds(square), num_partitions=4) == 0
    # K4 has 4 triangles
    k4 = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    assert triangle_count(_edges_ds(k4), num_partitions=4) == 4


def test_triangle_count_parallelism_invariant(ray_session):
    rng = np.random.default_rng(7)
    pairs = set()
    while len(pairs) < 60:
        x, y = rng.integers(0, 25, 2)
        if x != y:
            pairs.add((min(int(x), int(y)), max(int(x), int(y))))
    pairs = sorted(pairs)
    c1 = triangle_count(_edges_ds(pairs), num_partitions=2)
    c2 = triangle_count(_edges_ds(pairs), num_partitions=13)
    assert c1 == c2
    # independent reference: adjacency-matrix trace / 6
    n = 25
    m = np.zeros((n, n), dtype=np.int64)
    for x, y in pairs:
        m[x, y] = m[y, x] = 1
    want = int(np.trace(m @ m @ m) // 6)
    assert c1 == want


def test_triangle_count_no_wedges_returns_zero(ray_session):
    # matching-shaped graph: no node has out-degree >= 2 in any partition
    matching = [(1, 2), (3, 4), (5, 6)]
    assert triangle_count(_edges_ds(matching), num_partitions=4) == 0


def test_triangles_per_node_no_wedges_empty(ray_session):
    from webscraper_ray.functions.graph import triangles_per_node

    out = triangles_per_node(_edges_ds([(1, 2), (3, 4)]), num_partitions=4)
    assert out.count() == 0


def test_edit1_null_names_join_nothing(ray_session):
    ds = ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array([1, 2, 3, 4], pa.int64()),
                "name": pa.array([None, None, "abc", "abd"], pa.string()),
            }
        )
    )
    got = edit1_pairs(ds, "id", "name").to_pandas()
    # nulls pair with nothing (the SQL contract); only the real pair stays
    assert sorted(zip(got["id_a"], got["id_b"])) == [(3, 4)]
