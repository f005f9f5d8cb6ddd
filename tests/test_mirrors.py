"""Mirror-host pairs: brute parity on a planted mirror corpus plus the
hosts-per-fingerprint guard."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

P1 = "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10 a11 a12"
P2 = "b1 b2 b3 b4 b5 b6 b7 b8 b9 b10 b11 b12"


def _run(rows, **kw):
    import ray.data

    from webscraper_ray.functions.mirrors import mirror_host_pairs

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "source": pa.array([r[2] for r in rows], pa.string()),
            }
        )
    )
    out = mirror_host_pairs(ds, **kw).to_pandas()
    return out.sort_values(["host_a", "host_b"]).reset_index(drop=True)


def _brute(rows):
    sets: dict[str, set] = {}
    for _doc, text, host in rows:
        words = (text or "").split(" ")
        n_p = (len(words) + 11) // 12 or 1
        for pid in range(n_p):
            sets.setdefault(host, set()).add(
                " ".join(words[pid * 12 : pid * 12 + 12])
            )
    hosts = sorted(sets)
    out = {}
    for i, a in enumerate(hosts):
        for b in hosts[i + 1 :]:
            inter = len(sets[a] & sets[b])
            if inter:
                out[(a, b)] = (
                    inter,
                    round(inter / len(sets[a] | sets[b]), 6),
                )
    return out


@pytest.mark.usefixtures("ray_session")
def test_mirror_pairs_planted():
    rows = [
        (1, P1 + " " + P2, "mirrorA"),
        (2, P1 + " " + P2, "mirrorB"),  # full mirror of A
        (3, P1, "partialC"),  # shares only P1
        (4, "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10 z11 z12", "loner"),
    ]
    got = _run(rows)
    exp = _brute(rows)
    assert len(got) == len(exp) == 3
    for _, r in got.iterrows():
        assert (r["inter"], r["jaccard"]) == exp[(r["host_a"], r["host_b"])]
    ab = got[(got.host_a == "mirrorA") & (got.host_b == "mirrorB")].iloc[0]
    assert ab["jaccard"] == 1.0  # the full mirror


@pytest.mark.usefixtures("ray_session")
def test_mirror_pairs_random_bruteforce():
    rng = np.random.default_rng(13)
    vocab = [f"w{i}" for i in range(18)]
    rows = []
    for doc in range(30):
        n = int(rng.integers(1, 30))
        rows.append(
            (doc, " ".join(rng.choice(vocab, size=n)), f"h{int(rng.integers(0, 4))}")
        )
    # plant cross-host copies so overlaps exist (random 12-word windows
    # never collide); mirrored docs on a DIFFERENT host
    for j, (doc, text, host) in enumerate(rows[:8]):
        rows.append((100 + doc, text, f"h{(int(host[1]) + 1 + j % 3) % 4}"))
    got = _run(rows)
    exp = _brute(rows)
    assert len(got) == len(exp)
    for _, r in got.iterrows():
        assert (r["inter"], r["jaccard"]) == exp[(r["host_a"], r["host_b"])]


@pytest.mark.usefixtures("ray_session")
def test_mirror_hosts_per_hash_guard():
    rows = [(i, P1, f"h{i}") for i in range(6)]  # P1 on 6 hosts
    with pytest.raises(Exception, match="shared by 6 hosts"):
        _run(rows, max_hosts_per_hash=5)
