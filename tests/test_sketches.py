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
