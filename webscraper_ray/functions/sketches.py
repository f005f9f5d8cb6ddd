"""HyperLogLog registers — mergeable distinct-count sketch.

The exact `groupby().count_distinct` family shuffles every distinct
value; at 100 TB the standard scale path is a MERGEABLE sketch whose
state is a constant 2^p registers (Flajolet et al. 2007, public
algorithm). The register update (max of leading-zero ranks) is
order-free and associative, so per-batch partials -> one tiny
register-keyed reduce gives the identical sketch at any parallelism —
and because the md5 hash family is the repo's DuckDB-reproducible one,
the ORACLE RECOMPUTES THE REGISTERS EXACTLY (integer-gated; the float
estimate is a deterministic function of the registers, exposed as a
helper).

Scale shape: one streaming pass; the only exchange carries <= m rows
per block (m = 64 registers); driver artifact is the m-row sketch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .dedup import md5_u64

__all__ = ["P_BITS", "M_REGISTERS", "hll_register_partial", "hll_registers", "hll_estimate"]

P_BITS = 6
M_REGISTERS = 1 << P_BITS  # 64
_W_BITS = 64 - P_BITS  # 58 hash bits feed the rank


def hll_register_partial(batch: pa.Table, value_col: str) -> pa.Table:
    """(register, rho) per-batch partial: register = top P_BITS of the
    md5 hash, rho = leading-zero rank of the remaining _W_BITS (+1);
    an all-zero remainder ranks _W_BITS + 1."""
    vals = batch.column(value_col).to_pylist()
    uniq = set(vals)
    regs = np.zeros(M_REGISTERS, dtype=np.int64)
    mask = (1 << _W_BITS) - 1
    for v in uniq:
        h = int(md5_u64(str(v)))  # plain int: md5 hashes exceed int64
        reg = h >> _W_BITS
        rho = _W_BITS - (h & mask).bit_length() + 1
        if rho > regs[reg]:
            regs[reg] = rho
    idx = np.flatnonzero(regs)
    return pa.table(
        {
            "register": pa.array(idx.astype(np.int64)),
            "rho": pa.array(regs[idx]),
        }
    )


def hll_registers(ds, value_col: str):
    """Full sketch: all M_REGISTERS rows (rho 0 for untouched registers)
    so the output schema is fixed and mergeable by max."""
    import ray.data
    from ray.data.aggregate import Max

    dense = ray.data.from_arrow(
        pa.table(
            {
                "register": pa.array(range(M_REGISTERS), pa.int64()),
                "rho": pa.array([0] * M_REGISTERS, pa.int64()),
            }
        )
    )
    partials = ds.map_batches(
        hll_register_partial, fn_kwargs={"value_col": value_col},
        batch_format="pyarrow",
    )
    return (
        partials.union(dense)
        .groupby("register")
        .aggregate(Max("rho", alias_name="rho"))
    )


def hll_estimate(registers: dict[int, int]) -> float:
    """Standard HLL estimate with small-range correction — a pure
    function of the gated register table."""
    m = M_REGISTERS
    s = sum(2.0 ** -registers.get(i, 0) for i in range(m))
    alpha = 0.709  # alpha_64 per the paper
    e = alpha * m * m / s
    zeros = sum(1 for i in range(m) if registers.get(i, 0) == 0)
    if e <= 2.5 * m and zeros:
        import math

        return m * math.log(m / zeros)
    return e
