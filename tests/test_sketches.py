"""HyperLogLog — register determinism, mergeability, estimate accuracy."""

import numpy as np
import pyarrow as pa

import ray.data

from webscraper_ray.functions.sketches import (
    M_REGISTERS,
    hll_estimate,
    hll_register_partial,
    hll_registers,
)


def _vals(ids):
    return ray.data.from_arrow(pa.table({"v": pa.array(ids, pa.int64())}))


def _regs(ds):
    df = hll_registers(ds, "v").to_pandas()
    return dict(zip(df["register"], df["rho"]))


def test_full_register_table_and_invariance(ray_session):
    ids = list(range(1, 2001)) * 2  # duplicates must not affect the sketch
    lo = _regs(_vals(ids).repartition(1))
    hi = _regs(_vals(ids).repartition(16))
    assert lo == hi
    assert len(lo) == M_REGISTERS
    assert _regs(_vals(list(range(1, 2001)))) == lo  # dedup-invariant


def test_merge_is_register_max(ray_session):
    a, b = list(range(1, 500)), list(range(300, 900))
    ra, rb = _regs(_vals(a)), _regs(_vals(b))
    runion = _regs(_vals(a + b))
    assert runion == {i: max(ra[i], rb[i]) for i in range(M_REGISTERS)}


def test_estimate_accuracy(ray_session):
    true_n = 10_000
    regs = _regs(_vals(list(range(1, true_n + 1))))
    est = hll_estimate(regs)
    # m=64 -> standard error ~1.04/sqrt(64) = 13%; allow 3 sigma
    assert abs(est - true_n) / true_n < 0.4
    # small-range correction path
    small = _regs(_vals(list(range(1, 21))))
    est_small = hll_estimate(small)
    assert abs(est_small - 20) / 20 < 0.5


def test_partial_empty_batch():
    t = pa.table({"v": pa.array([], pa.int64())})
    assert hll_register_partial(t, "v").num_rows == 0


def _docs(texts):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )


def test_countmin_overestimates_never_under(ray_session):
    """CM guarantee: est >= true count; parallelism-invariant registers."""
    from collections import Counter

    from webscraper_ray.functions.sketches import countmin_estimates

    texts = ["a b c a", "b b d", "a e f g", ""] * 25
    true = Counter(w for t in texts for w in t.split())
    toks = sorted(true) + ["absent"]
    lo = countmin_estimates(_docs(texts).repartition(1), toks).to_pydict()
    hi = countmin_estimates(_docs(texts).repartition(8), toks).to_pydict()
    assert lo == hi
    for tok, est in zip(lo["token"], lo["est_count"]):
        assert est >= true.get(tok, 0), tok


def test_bloom_no_false_negatives(ray_session):
    """Every doc sharing a 3-gram with the bench set MUST flag."""
    import ray

    from webscraper_ray.functions.sketches import bloom_bits, bloom_contamination

    bench_grams = {"x y z", "p q r"}
    bits_ref = ray.put(bloom_bits(bench_grams))
    texts = ["a x y z b", "p q r", "a b c d", "no overlap here"]
    out = (
        bloom_contamination(_docs(texts), bits_ref, n=3)
        .to_pandas()
        .sort_values("doc_id")
    )
    flags = list(out["maybe_contaminated"])
    assert flags[0] and flags[1]  # true hits always flag


def test_percentile_rank_matches_window_and_guards(ray_session):
    import pytest

    from webscraper_ray.functions.stats import percentile_rank

    vals = [10, 20, 20, 30, 40]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array(range(5), pa.int64()),
                "v": pa.array(vals, pa.int64()),
            }
        )
    )
    out = percentile_rank(ds, "id", "v").to_pandas().sort_values("id")
    # percent_rank: (min_rank - 1) / (n - 1); ties share the min rank
    assert list(out["pct_rank"]) == [0.0, 0.25, 0.25, 0.75, 1.0]
    with pytest.raises(ValueError):
        percentile_rank(ds, "id", "v", max_distinct=2).to_pandas()
