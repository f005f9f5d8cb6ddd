"""Exact prefix-filter similarity join — recall vs brute force."""

import numpy as np
import pyarrow as pa

import ray.data

from webscraper_ray.functions.dedup import _shingles, md5_u64
from webscraper_ray.functions.setjoin import similarity_join


def _brute_pairs(texts, threshold):
    sets = {i: {md5_u64(s) for s in _shingles(t)} for i, t in texts.items()}
    out = {}
    ids = sorted(sets)
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = sets[ids[i]], sets[ids[j]]
            if not a or not b:
                continue
            inter = len(a & b)
            jac = inter / (len(a) + len(b) - inter)
            if jac >= threshold:
                out[(ids[i], ids[j])] = jac
    return out


def _ds(texts):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(sorted(texts), pa.int64()),
                "text": pa.array([texts[k] for k in sorted(texts)], pa.string()),
            }
        )
    )


def test_exact_recall_matches_bruteforce(ray_session):
    rng = np.random.RandomState(3)
    vocab = [f"w{i}" for i in range(40)]
    texts = {}
    base = " ".join(rng.choice(vocab, 30))
    for i in range(24):
        if i % 3 == 0:
            # near-dups of the base doc: drop/replace a few words
            words = base.split()
            for _ in range(rng.randint(0, 4)):
                words[rng.randint(len(words))] = str(rng.choice(vocab))
            texts[i] = " ".join(words)
        else:
            texts[i] = " ".join(rng.choice(vocab, rng.randint(8, 30)))
    for thr in (0.3, 0.5, 0.8):
        got = {
            (r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in similarity_join(_ds(texts), threshold=thr).take_all()
        }
        want = _brute_pairs(texts, thr)
        assert set(got) == set(want), thr
        for k in want:
            assert abs(got[k] - want[k]) < 1e-12


def test_short_and_empty_docs_are_skipped(ray_session):
    texts = {1: "", 2: "one two", 3: "a b c a b c a b c", 4: "a b c a b c a b c"}
    got = similarity_join(_ds(texts), threshold=0.5).take_all()
    assert [(r["doc_a"], r["doc_b"]) for r in got] == [(3, 4)]
    assert got[0]["jaccard"] == 1.0
