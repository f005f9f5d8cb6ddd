"""Exact containment (overlap-coefficient) join
(functions/setjoin.containment_join): brute-force recall equality,
the quote-inside-long-doc case Jaccard misses, and parallelism
invariance."""

import numpy as np
import pyarrow as pa

import ray.data

from webscraper_ray.functions.dedup import _shingles
from webscraper_ray.functions.setjoin import containment_join, similarity_join


def _brute(docs: dict[int, str], t: float) -> dict[tuple[int, int], float]:
    out = {}
    ids = sorted(docs)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            sa, sb = _shingles(docs[a]), _shingles(docs[b])
            if not sa or not sb:
                continue
            c = len(sa & sb) / min(len(sa), len(sb))
            if c >= t:
                out[(a, b)] = c
    return out


def _run(docs: dict[int, str], t: float, parts: int = 4):
    tbl = pa.table(
        {
            "doc_id": pa.array(sorted(docs), pa.int64()),
            "text": pa.array([docs[k] for k in sorted(docs)], pa.string()),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(parts)
    rows = containment_join(ds, threshold=t).take_all()
    return {(r["doc_a"], r["doc_b"]): r["containment"] for r in rows}


def _corpus(n: int, seed: int = 11) -> dict[int, str]:
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(40)]
    docs = {}
    for i in range(n):
        ln = int(rng.integers(6, 30))
        docs[i] = " ".join(rng.choice(vocab, size=ln))
    # plant: 3 docs fully contained in longer hosts
    docs[n] = docs[0] + " " + " ".join(rng.choice(vocab, size=40))
    docs[n + 1] = " ".join(rng.choice(vocab, size=35)) + " " + docs[1]
    docs[n + 2] = docs[2]
    return docs


def test_matches_bruteforce(ray_session):
    docs = _corpus(25)
    assert _run(docs, 0.7) == _brute(docs, 0.7)


def test_finds_quote_jaccard_misses(ray_session):
    """A short doc quoted verbatim inside a much longer one: containment
    = 1.0 but Jaccard is far below any dedup threshold — the exact
    Jaccard join must miss it at 0.7 while the containment join finds
    it."""
    quote = "alpha beta gamma delta epsilon zeta"
    filler = " ".join(f"tok{i}" for i in range(120))
    docs = {1: quote, 2: filler + " " + quote + " " + filler}
    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array([docs[1], docs[2]], pa.string()),
        }
    )
    ds = ray.data.from_arrow(tbl)
    cont = containment_join(ds, threshold=0.7).take_all()
    assert [(r["doc_a"], r["doc_b"], r["containment"]) for r in cont] == [
        (1, 2, 1.0)
    ]
    jac = similarity_join(ds, threshold=0.7).take_all()
    assert jac == []


def test_parallelism_invariant(ray_session):
    docs = _corpus(20, seed=3)
    assert _run(docs, 0.7, parts=1) == _run(docs, 0.7, parts=9)


def test_empty_and_tiny_docs(ray_session):
    docs = {1: "", 2: "a b", 3: "x y z w v u t s", 4: "x y z w v u t s"}
    got = _run(docs, 0.7)
    assert got == {(3, 4): 1.0}
