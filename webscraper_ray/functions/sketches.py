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

__all__ = [
    "P_BITS",
    "M_REGISTERS",
    "hll_register_partial",
    "hll_registers",
    "hll_registers_by_group",
    "hll_estimate",
]

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


# ---------------------------------------------------------------------------
# Count-Min sketch — mergeable frequency estimator (Cormode & Muthukrishnan
# 2005, public algorithm). Register state is a constant DEPTH x WIDTH int
# matrix; per-batch partial sketches SUM, so the merge is order-free and
# the md5 bucket family is DuckDB-reproducible: the ORACLE recomputes the
# registers (and therefore the min-estimates) exactly.
# ---------------------------------------------------------------------------

CM_DEPTH = 4
CM_WIDTH = 64


def countmin_partial(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """(depth, bucket, cnt) partial register rows for one batch: token
    occurrence counts hashed into CM_WIDTH buckets per depth row. The
    partial is at most DEPTH x WIDTH rows regardless of batch size."""
    from collections import Counter

    counts: Counter = Counter()
    for t in batch.column(text_col).to_pylist():
        if t and t.strip():
            counts.update(t.split())
    regs = np.zeros((CM_DEPTH, CM_WIDTH), dtype=np.int64)
    for tok, c in counts.items():
        for d in range(CM_DEPTH):
            regs[d, md5_u64(f"{d}|{tok}") % CM_WIDTH] += c
    d_idx, b_idx = np.nonzero(regs)
    return pa.table(
        {
            "depth": pa.array(d_idx.astype(np.int64)),
            "bucket": pa.array(b_idx.astype(np.int64)),
            "cnt": pa.array(regs[d_idx, b_idx]),
        }
    )


def countmin_registers(ds, text_col: str = "text"):
    """Full sketch as a Dataset: one streaming pass, one <= DEPTH*WIDTH-row
    keyed reduce."""
    from ray.data.aggregate import Sum

    return (
        ds.map_batches(
            countmin_partial, fn_kwargs={"text_col": text_col},
            batch_format="pyarrow",
        )
        .groupby(["depth", "bucket"])
        .aggregate(Sum("cnt", alias_name="cnt"))
    )


def countmin_estimates(ds, tokens: list[str], text_col: str = "text") -> pa.Table:
    """Point-frequency estimates for ``tokens``: min over depth rows of
    the addressed register. The driver artifact is the constant-size
    register matrix — never the vocabulary."""
    regs = np.zeros((CM_DEPTH, CM_WIDTH), dtype=np.int64)
    for b in countmin_registers(ds, text_col).iter_batches(batch_format="pyarrow"):
        d = b.column("depth").to_numpy(zero_copy_only=False)
        w = b.column("bucket").to_numpy(zero_copy_only=False)
        regs[d, w] = b.column("cnt").to_numpy(zero_copy_only=False)
    ests = [
        int(min(regs[d, md5_u64(f"{d}|{tok}") % CM_WIDTH] for d in range(CM_DEPTH)))
        for tok in tokens
    ]
    return pa.table(
        {
            "token": pa.array(list(tokens), pa.string()),
            "est_count": pa.array(ests, pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# Bloom filter — constant-size set-membership sketch (Bloom 1970, public
# algorithm). The build side ORs per-batch bit arrays (order-free merge);
# membership is k md5 probes. Deterministic md5 positions make the filter
# — including its false positives — exactly reproducible in SQL.
# ---------------------------------------------------------------------------

BLOOM_M_BITS = 4096
BLOOM_K = 3


def bloom_positions(gram: str) -> list[int]:
    """The K bit positions of one item (md5 family, DuckDB-reproducible)."""
    return [md5_u64(f"{i}|{gram}") % BLOOM_M_BITS for i in range(BLOOM_K)]


def bloom_bits(items) -> np.ndarray:
    """Dense bit array for a small (benchmark-sized) item set."""
    bits = np.zeros(BLOOM_M_BITS, dtype=bool)
    for g in items:
        bits[bloom_positions(g)] = True
    return bits


def bloom_contamination(ds, bits_ref, n: int = 3, text_col: str = "text"):
    """Per-doc Bloom decontamination flag: does ANY distinct word n-gram
    of the doc hit all K filter bits? Same corpus shape as the exact
    n-gram check (one streaming map_batches, broadcast read once per
    task) but the broadcast is the CONSTANT-SIZE bit array instead of
    the benchmark gram set — the 100-TB shape when the eval suite
    itself is large. False positives are possible and deterministic."""
    import ray

    def check(batch: pa.Table) -> pa.Table:
        bits = ray.get(bits_ref)
        flags = []
        for t in batch.column(text_col).to_pylist():
            toks = t.split() if t and t.strip() else []
            grams = {
                " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
            }
            flags.append(
                any(bool(bits[bloom_positions(g)].all()) for g in grams)
            )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "maybe_contaminated": pa.array(flags, pa.bool_()),
            }
        )

    return ds.map_batches(check, batch_format="pyarrow")


def hll_register_partial_by_group(
    batch: pa.Table, group_col: str, value_col: str
) -> pa.Table:
    """Grouped variant of :func:`hll_register_partial`: per-batch
    (group, register, rho) partials — at most |groups| x M_REGISTERS
    rows per block regardless of batch size."""
    groups = batch.column(group_col).to_pylist()
    vals = batch.column(value_col).to_pylist()
    best: dict = {}
    mask = (1 << _W_BITS) - 1
    for g, v in set(zip(groups, vals)):
        h = int(md5_u64(str(v)))
        reg = h >> _W_BITS
        rho = _W_BITS - (h & mask).bit_length() + 1
        key = (g, reg)
        if rho > best.get(key, 0):
            best[key] = rho
    items = sorted(best.items())
    return pa.table(
        {
            group_col: pa.array([k[0] for k, _ in items]),
            "register": pa.array([k[1] for k, _ in items], pa.int64()),
            "rho": pa.array([r for _, r in items], pa.int64()),
        }
    )


def hll_registers_by_group(ds, group_col: str, value_col: str):
    """Mergeable per-group sketches: ONE (group, register)-keyed max
    reduce whose payload is bounded by |groups| x M_REGISTERS rows per
    block — never by value cardinality. Touched registers only (rho 0
    rows are omitted on both sides; :func:`hll_estimate` treats missing
    registers as 0)."""
    from ray.data.aggregate import Max

    partials = ds.map_batches(
        hll_register_partial_by_group,
        fn_kwargs={"group_col": group_col, "value_col": value_col},
        batch_format="pyarrow",
    )
    return (
        partials.groupby([group_col, "register"])
        .aggregate(Max("rho", alias_name="rho"))
    )


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch — Bar-Yossef et al. 2002, public
# algorithm. State = the K smallest DISTINCT 64-bit hashes seen; merge =
# union -> keep K smallest, so per-batch partials (<= K rows each) reduce
# through ONE constant-key exchange. Unlike HLL's fixed 64 registers the
# state adapts to the stream, and the estimate (K-1) * 2^64 / h_K has
# relative error ~1/sqrt(K). The md5 hash family is DuckDB-reproducible,
# so the ORACLE recomputes the register rows (and the integer estimate)
# exactly.
# ---------------------------------------------------------------------------

KMV_K = 64


def kmv_partial(batch: pa.Table, value_col: str) -> pa.Table:
    """Bottom-K distinct hashes of one batch (<= K rows emitted)."""
    vals = set(batch.column(value_col).to_pylist())
    if not vals:
        return pa.table({"h": pa.array([], pa.uint64())})
    hs = np.fromiter(
        (md5_u64(str(v)) for v in vals), dtype=np.uint64, count=len(vals)
    )
    hs = np.unique(hs)  # sorted ascending, deduped
    return pa.table({"h": pa.array(hs[:KMV_K], pa.uint64())})


def kmv_sketch(ds, value_col: str) -> pa.Table:
    """Full sketch + integer estimate.

    Returns ``(rank, h, est_distinct)`` rows: the K smallest distinct
    hashes ranked ascending, with the KMV estimate
    ``(K-1) * 2^64 // h_K`` (exact Python-int division; when fewer than
    K distinct values exist the sketch is the whole domain and the
    estimate is the exact count). Shape: per-batch bottom-K partials ->
    one constant-key exchange carrying <= K rows per block -> a single
    K-row merge task; driver artifact is the K-row sketch itself.
    """
    partials = ds.map_batches(
        kmv_partial, fn_kwargs={"value_col": value_col}, batch_format="pyarrow"
    )

    def merge(t: pa.Table) -> pa.Table:
        hs = np.unique(t.column("h").to_numpy(zero_copy_only=False))[:KMV_K]
        n = int(hs.size)
        if n < KMV_K:
            est = n
        else:
            est = (KMV_K - 1) * (1 << 64) // int(hs[-1])
        return pa.table(
            {
                "rank": pa.array(np.arange(1, n + 1, dtype=np.int64)),
                "h": pa.array(hs, pa.uint64()),
                "est_distinct": pa.array(np.full(n, est, dtype=np.int64)),
            }
        )

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column(
            "_g", pa.array(np.zeros(t.num_rows, dtype=np.int64))
        )

    merged = (
        partials.map_batches(tag, batch_format="pyarrow")
        .groupby("_g")
        .map_groups(
            lambda t: merge(t.drop_columns(["_g"])), batch_format="pyarrow"
        )
    )
    parts = [p for p in merged.to_arrow_refs()]
    import ray

    tables = [t for t in ray.get(parts) if t.num_rows > 0]
    return pa.concat_tables(tables).combine_chunks()
