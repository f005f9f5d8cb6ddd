"""Host-level boilerplate detection: brute-force parity on a planted
corpus plus the host-isolation property (the same paragraph on two
DIFFERENT hosts is NOT chrome)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

PARA = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"  # exactly one 12-word window


def _run(rows, min_docs=2):
    import ray.data

    from webscraper_ray.functions.boilerplate import boilerplate_stats

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "source": pa.array([r[2] for r in rows], pa.string()),
            }
        )
    )
    out = boilerplate_stats(ds, min_docs=min_docs).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _brute(rows, min_docs=2):
    from collections import defaultdict

    paras = []  # (doc, host, ptext)
    for doc, text, host in rows:
        words = (text or "").split(" ")
        n_p = (len(words) + 11) // 12 or 1
        for pid in range(n_p):
            paras.append((doc, host, " ".join(words[pid * 12 : pid * 12 + 12])))
    docs_per = defaultdict(set)
    for doc, host, p in paras:
        docs_per[(host, p)].add(doc)
    out = {}
    for doc, host, p in paras:
        n, b, c = out.get(doc, (0, 0, 0))
        boiler = len(docs_per[(host, p)]) >= min_docs
        out[doc] = (n + 1, b + int(boiler), c + int(boiler) * len(p))
    return out


@pytest.mark.usefixtures("ray_session")
def test_boilerplate_planted_and_host_isolated():
    body = lambda i: f"unique{i} " + " ".join(f"x{i}_{j}" for j in range(11))
    rows = [
        # hostA: PARA appears in docs 1,2,3 -> chrome on hostA
        (1, PARA + " " + body(1), "hostA"),
        (2, PARA + " " + body(2), "hostA"),
        (3, body(3), "hostA"),
        # doc 3 has no chrome; doc 4 is hostB with the SAME PARA — but
        # alone on its host, so NOT chrome (host isolation)
        (4, PARA + " " + body(4), "hostB"),
        # doc 5 repeats PARA twice within itself on hostC: still one
        # distinct doc -> not chrome at min_docs=2
        (5, PARA + " " + PARA, "hostC"),
    ]
    got = _run(rows)
    exp = _brute(rows)
    assert len(got) == 5
    for _, r in got.iterrows():
        assert (
            r["n_paras"],
            r["n_boiler"],
            r["boiler_chars"],
        ) == exp[r["doc_id"]], r["doc_id"]
    by_id = got.set_index("doc_id")
    assert by_id.loc[1, "n_boiler"] == 1 and by_id.loc[2, "n_boiler"] == 1
    assert by_id.loc[3, "n_boiler"] == 0
    assert by_id.loc[4, "n_boiler"] == 0  # host isolation
    assert by_id.loc[5, "n_boiler"] == 0  # within-doc repeat only


@pytest.mark.usefixtures("ray_session")
def test_boilerplate_matches_bruteforce_random():
    rng = np.random.default_rng(7)
    vocab = [f"t{i}" for i in range(30)]
    rows = []
    for doc in range(40):
        n = int(rng.integers(0, 40))
        text = " ".join(rng.choice(vocab, size=n)) if n else ""
        rows.append((doc, text, f"h{int(rng.integers(0, 3))}"))
    got = _run(rows)
    exp = _brute(rows)
    assert len(got) == 40
    for _, r in got.iterrows():
        assert (
            r["n_paras"],
            r["n_boiler"],
            r["boiler_chars"],
        ) == exp[r["doc_id"]], r["doc_id"]
