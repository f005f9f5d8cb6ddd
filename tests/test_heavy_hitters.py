"""Misra-Gries heavy hitters — exactness, threshold edge, and the
per-block superset guarantee under adversarial splits."""

import pyarrow as pa

import ray.data

from webscraper_ray.functions.textstats import _mg_summary, heavy_hitter_tokens


def _docs(texts, parallelism):
    return ray.data.from_arrow(
        pa.table({"text": pa.array(texts, pa.string())})
    ).repartition(parallelism)


def _hh(ds, k):
    df = heavy_hitter_tokens(ds, k=k).to_pandas()
    if df.empty:
        return {}
    return dict(zip(df["token"], df["freq"]))


def test_mg_summary_keeps_majority_item():
    # 'a' x 6 among 10 tokens: survives any k>=2 sketch
    toks = ["a", "b", "a", "c", "a", "d", "a", "e", "a", "a"]
    assert "a" in _mg_summary(toks, 2)


def test_exact_output_and_threshold_edge(ray_session):
    # N = 16 tokens; k = 4 -> threshold freq > 4. 'x' has 5 (in), 'y'
    # has exactly 4 (OUT: strict >), fillers unique.
    texts = ["x x x x x", "y y y y", "a b c d e f g"]
    out = _hh(_docs(texts, 1), k=4)
    assert out == {"x": 5}


def test_superset_survives_adversarial_split(ray_session):
    # the heavy token is DILUTED in every block (never a block-local
    # majority by a wide margin) but must still be found globally
    texts = [f"h f{i} f{i}b f{i}c" for i in range(12)]  # h freq 12 of 48
    out = _hh(_docs(texts, 6), k=3)  # threshold: freq > 16 -> none
    assert out == {}
    out = _hh(_docs(texts, 6), k=5)  # threshold: freq > 9.6 -> h only
    assert out == {"h": 12}


def test_parallelism_invariance(ray_session):
    texts = [f"t{i % 7} t{i % 3} pad{i}" for i in range(60)]
    a = _hh(_docs(texts, 2), k=8)
    b = _hh(_docs(texts, 11), k=8)
    assert a == b
