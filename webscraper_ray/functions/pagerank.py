"""Distributed PageRank over a derived link graph — crawl prioritization.

A batch crawler needs a page-importance signal to order its frontier
(the reference crawls breadth-first per collection; a web-scale engine
ranks). PageRank is the canonical iterative graph operator Ray Data has
no primitive for, so — per the task brief's custom-operator ladder —
it is built as composition (a): one ``map_batches`` emit + one
hash-partition sum-reduce exchange per iteration, the same BSP shape as
:mod:`.graph`'s label propagation.

Determinism / oracle-gating discipline (the k-means pattern,
``clustering.py``): ranks are QUANTIZED int64 (``Q = 10**9`` mass units
per node), every edge contribution is ``r // out_degree`` and the
damping step is ``BASE + (85 * s) // 100`` — integer floors applied in
an order-independent way, so parallel execution order cannot perturb a
single bit and DuckDB recomputes the exact registers via chained CTEs
(one per iteration, the ``_kmeans_cte_parts`` trick).

The graph itself is DERIVED, not stored: node ``u`` links to
``md5_u64(f"pr:{u}:{j}") % n_nodes`` for ``j < out_degree`` — the
md5-prefix family every sketch here uses, reproducible in SQL. Because
out-links are a pure function of the node id, the frontier CARRIES its
out-link columns (computed once, shipped as 3 extra int64s per node per
round) instead of re-hashing or joining an edge table every round —
each iteration is exactly ONE frontier-sized exchange, no edge-side
shuffle at all.

Scale shape (per iteration, V = node count):
- emit map: 4 rows per node (3 messages + the node's own carried row),
  pure per-batch compute, no driver involvement;
- ONE hash-partition exchange of those rows; per-partition sum-reduce
  via sorted ``searchsorted`` + ``np.add.at`` (int64-exact — never a
  float bincount, whose weights lose integer exactness past 2^53);
- ``repartition(num_parts)`` re-bounds the frontier's block count each
  round (the :mod:`.graph` lesson: groupby output blocks track input
  blocks, so an un-coalesced iterative loop doubles its block count
  every round).
Total mass is ``<= V * Q``; with ``V <= 10^8`` per partition-group and
the 85/100 step the int64 headroom holds to ~10^16 mass — loudly
guarded below rather than silently wrapped.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from .dedup import md5_u64
from .joins import _part_column

__all__ = ["Q", "BASE", "OUT_DEGREE", "pagerank"]

Q = 1_000_000_000  # initial quantized rank mass per node
OUT_DEGREE = 3
BASE = (15 * Q) // 100  # damping: r' = BASE + (85 * sum_in) // 100

_MASS_GUARD = (1 << 62) // 100  # 85 * total_in must stay inside int64


def _out_links(
    ids: np.ndarray, n_nodes: int, prefix: str = "pr"
) -> list[np.ndarray]:
    """Static out-links of each node: md5 family, SQL-reproducible.
    Shared by pagerank ('pr'), HITS ('hits'), and the assortativity
    query — ONE definition of the derived-graph family."""
    cols = []
    for j in range(OUT_DEGREE):
        cols.append(
            np.fromiter(
                (md5_u64(f"{prefix}:{u}:{j}") % n_nodes for u in ids),
                dtype=np.uint64,
                count=len(ids),
            ).astype(np.int64)
        )
    return cols


def pagerank(
    ids: "ray.data.Dataset",
    n_nodes: int,
    iters: int = 5,
    id_col: str = "doc_id",
    num_parts: int = 16,
    trust_mod: "int | None" = None,
) -> "ray.data.Dataset":
    """(doc_id, rank_q) after ``iters`` damped iterations over the
    derived 3-regular graph. Exact-integer, parallelism-invariant.

    ``trust_mod``: when set, runs TRUSTRANK (Gyöngyi et al., VLDB'04 —
    the web-spam companion of PageRank): the teleport mass lands ONLY
    on the trusted seed set ``id % trust_mod == 0`` (seeds get the BASE
    term and the initial Q; everything else starts at 0 and earns rank
    purely through in-links from trusted neighborhoods). Same exchange
    shape, same integer registers — trustedness is a pure function of
    the node id, so the reduce needs no extra shuffled column."""
    if n_nodes <= 0:
        return ray.data.from_arrow(
            pa.table({"doc_id": pa.array([], pa.int64()),
                      "rank_q": pa.array([], pa.int64())})
        )
    if n_nodes * Q >= _MASS_GUARD:
        raise ValueError(
            f"pagerank int64 mass headroom exceeded for n_nodes={n_nodes}; "
            "lower Q or shard the mass scale explicitly"
        )

    def seed(t: pa.Table) -> pa.Table:
        ids_np = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        d0, d1, d2 = _out_links(ids_np, n_nodes)
        if trust_mod is None:
            r0 = np.full(len(ids_np), Q, dtype=np.int64)
        else:
            r0 = np.where(ids_np % trust_mod == 0, Q, 0).astype(np.int64)
        return pa.table(
            {
                "id": pa.array(ids_np),
                "d0": pa.array(d0),
                "d1": pa.array(d1),
                "d2": pa.array(d2),
                "r": pa.array(r0),
            }
        )

    frontier = ids.map_batches(seed, batch_format="pyarrow").repartition(
        num_parts
    ).materialize()

    # union schema per round: side 0 = message (a=dst, b=contrib, d*=0),
    # side 1 = the node's carried row (a=id, b=r, d* = real out-links)
    def emit(t: pa.Table) -> pa.Table:
        ids_np = t.column("id").to_numpy(zero_copy_only=False)
        r = t.column("r").to_numpy(zero_copy_only=False)
        contrib = r // OUT_DEGREE
        dcols = [
            t.column(c).to_numpy(zero_copy_only=False) for c in ("d0", "d1", "d2")
        ]
        n = len(ids_np)
        a = np.concatenate([*dcols, ids_np])
        b = np.concatenate([contrib, contrib, contrib, r])
        side = np.zeros(4 * n, dtype=np.int8)
        side[3 * n:] = 1
        zero3 = np.zeros(3 * n, dtype=np.int64)
        d0 = np.concatenate([zero3, dcols[0]])
        d1 = np.concatenate([zero3, dcols[1]])
        d2 = np.concatenate([zero3, dcols[2]])
        out = pa.table(
            {
                "_part": _part_column(pa.chunked_array([pa.array(a)]), num_parts),
                "_side": pa.array(side),
                "a": pa.array(a),
                "b": pa.array(b),
                "d0": pa.array(d0),
                "d1": pa.array(d1),
                "d2": pa.array(d2),
            }
        )
        return out

    def sum_reduce(part: pa.Table) -> pa.Table:
        side = part.column("_side").to_numpy(zero_copy_only=False)
        a = part.column("a").to_numpy(zero_copy_only=False)
        b = part.column("b").to_numpy(zero_copy_only=False)
        node_mask = side == 1
        ids_np = a[node_mask]
        order = np.argsort(ids_np)
        ids_np = ids_np[order]
        dcols = [
            part.column(c).to_numpy(zero_copy_only=False)[node_mask][order]
            for c in ("d0", "d1", "d2")
        ]
        sums = np.zeros(len(ids_np), dtype=np.int64)
        # every message dst is a real node id (derived mod n_nodes), and
        # the node's carried row puts every id in this partition's side-1
        # set — searchsorted is total; guard the DENSE-id precondition
        # loudly instead of mis-accumulating on a sparse id space
        dsts = a[~node_mask]
        idx = np.searchsorted(ids_np, dsts)
        if len(dsts) and (
            len(ids_np) == 0
            or not np.array_equal(ids_np[np.minimum(idx, len(ids_np) - 1)], dsts)
        ):
            raise ValueError(
                "pagerank requires node ids dense in [0, n_nodes): a message "
                "targeted an id absent from the frontier"
            )
        np.add.at(sums, idx, b[~node_mask])
        if trust_mod is None:
            base = BASE
        else:
            base = np.where(ids_np % trust_mod == 0, BASE, 0).astype(np.int64)
        r_new = base + (85 * sums) // 100
        return pa.table(
            {
                "id": pa.array(ids_np),
                "d0": pa.array(dcols[0]),
                "d1": pa.array(dcols[1]),
                "d2": pa.array(dcols[2]),
                "r": pa.array(r_new),
            }
        )

    # no per-round repartition (unlike graph.py's label loop): the
    # frontier is the groupby's ONLY input, so its block count stays
    # ~num_parts across rounds instead of compounding via a union
    for _ in range(iters):
        frontier = (
            frontier.map_batches(emit, batch_format="pyarrow")
            .groupby("_part")
            .map_groups(sum_reduce, batch_format="pyarrow")
            .materialize()
        )

    def project(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t.column("id"), "rank_q": t.column("r")})

    return frontier.map_batches(project, batch_format="pyarrow")
