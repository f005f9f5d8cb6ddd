"""Distributed HITS (hubs & authorities, Kleinberg JACM'99) over the
derived doc link graph — the second classic web-graph ranking signal
next to :mod:`.pagerank`: authorities are pages good hubs point AT,
hubs are pages that point at good authorities. A crawl frontier uses
the hub score to pick link-rich index pages and the authority score to
rank extraction targets.

Same determinism / oracle-gating discipline as pagerank (quantized
int64, the k-means ``clustering.py`` pattern), with HITS's
normalization replaced by an exact-integer max-rescale: after each
half-step every score is ``(s * Q) // max(s)`` — a global max is the
ONE driver scalar the step needs (control-sized), and integer floors
applied order-independently mean parallel execution cannot perturb a
bit, so DuckDB replays the exact registers via chained CTEs.

Graph: node ``u`` links to ``md5_u64(f"hits:{u}:{j}") % n_nodes`` for
``j < OUT_DEGREE`` (the md5-prefix family, SQL-reproducible); edge
multiplicity is PRESERVED on both sides (no dedup) so the two engines
sum identical multisets.

Scale shape, per iteration (V = node count, E = 3V):
- authority half-step: ONE hash exchange of E messages + V carried
  rows, per-partition sorted ``searchsorted`` + ``np.add.at`` exact
  int64 sum-reduce (the pagerank kernel);
- hub half-step: TWO exchanges — a tagged-union lookup (authority
  values meet the edge rows that need them, keyed by the authority id)
  then the same sum-reduce keyed by the hub id. HITS needs the extra
  exchange because hub scores pull from out-neighbors (a transpose of
  the message direction pagerank uses); carrying out-links in the
  frontier (the pagerank trick) removes every md5 re-hash after seed.
- two driver scalars (max(a), max(h)) per iteration; nothing else
  leaves the cluster. ``materialize()`` per half-step keeps the lazy
  graph from recomputing under the max aggregate; block counts stay
  ~num_parts because each groupby's only input is the frontier.

int64 headroom: scores are <= Q after each rescale, raw sums are
<= indeg_max * Q, and the rescale multiplies by Q — guarded loudly
against 2^62 rather than silently wrapped.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from .joins import _part_column

__all__ = ["Q", "OUT_DEGREE", "hits"]

Q = 1_000_000  # quantized score unit (per-node max after each rescale)
OUT_DEGREE = 3

_GUARD = 1 << 62


def _out_links(ids: np.ndarray, n_nodes: int) -> list[np.ndarray]:
    from .pagerank import _out_links as _pr_links

    return _pr_links(ids, n_nodes, prefix="hits")


def _np(t: pa.Table, name: str) -> np.ndarray:
    return t.column(name).to_numpy(zero_copy_only=False)


def hits(
    ids: "ray.data.Dataset",
    n_nodes: int,
    iters: int = 3,
    id_col: str = "doc_id",
    num_parts: int = 16,
) -> "ray.data.Dataset":
    """(doc_id, hub_q, auth_q) after ``iters`` exact-integer HITS
    iterations over the derived 3-out-regular graph."""
    if n_nodes <= 0:
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "hub_q": pa.array([], pa.int64()),
                "auth_q": pa.array([], pa.int64()),
            }
        )
        return ray.data.from_arrow(empty)

    def seed(t: pa.Table) -> pa.Table:
        ids_np = _np(t, id_col).astype(np.int64)
        d0, d1, d2 = _out_links(ids_np, n_nodes)
        return pa.table(
            {
                "id": pa.array(ids_np),
                "d0": pa.array(d0),
                "d1": pa.array(d1),
                "d2": pa.array(d2),
                "h": pa.array(np.full(len(ids_np), Q, dtype=np.int64)),
            }
        )

    frontier = (
        ids.map_batches(seed, batch_format="pyarrow")
        .repartition(num_parts)
        .materialize()
    )

    # -- authority half-step: messages (dst, h) + carried node rows ----
    def emit_auth(t: pa.Table) -> pa.Table:
        ids_np = _np(t, "id")
        h = _np(t, "h")
        dcols = [_np(t, c) for c in ("d0", "d1", "d2")]
        n = len(ids_np)
        key = np.concatenate([*dcols, ids_np])
        val = np.concatenate([h, h, h, np.zeros(n, dtype=np.int64)])
        side = np.zeros(4 * n, dtype=np.int8)
        side[3 * n :] = 1
        zero3 = np.zeros(3 * n, dtype=np.int64)
        return pa.table(
            {
                "_part": _part_column(pa.chunked_array([pa.array(key)]), num_parts),
                "_side": pa.array(side),
                "key": pa.array(key),
                "val": pa.array(val),
                "d0": pa.array(np.concatenate([zero3, dcols[0]])),
                "d1": pa.array(np.concatenate([zero3, dcols[1]])),
                "d2": pa.array(np.concatenate([zero3, dcols[2]])),
            }
        )

    def _sum_by_node(part: pa.Table, extra: tuple[str, ...] = ()) -> dict:
        """Shared exact sum-reduce: side-1 rows define the node set (and
        carry columns), side-0 rows accumulate into their key's slot."""
        side = _np(part, "_side")
        key = _np(part, "key")
        val = _np(part, "val")
        node_mask = side == 1
        ids_np = key[node_mask]
        order = np.argsort(ids_np)
        ids_np = ids_np[order]
        carried = {c: _np(part, c)[node_mask][order] for c in ("d0", "d1", "d2")}
        for c in extra:
            carried[c] = _np(part, c)[node_mask][order]
        sums = np.zeros(len(ids_np), dtype=np.int64)
        dsts = key[~node_mask]
        idx = np.searchsorted(ids_np, dsts)
        if len(dsts) and (
            len(ids_np) == 0
            or not np.array_equal(ids_np[np.minimum(idx, len(ids_np) - 1)], dsts)
        ):
            raise ValueError(
                "hits requires node ids dense in [0, n_nodes): a message "
                "targeted an id absent from the frontier"
            )
        np.add.at(sums, idx, val[~node_mask])
        return {"ids": ids_np, "sums": sums, **carried}

    def reduce_auth(part: pa.Table) -> pa.Table:
        r = _sum_by_node(part)
        return pa.table(
            {
                "id": pa.array(r["ids"]),
                "d0": pa.array(r["d0"]),
                "d1": pa.array(r["d1"]),
                "d2": pa.array(r["d2"]),
                "araw": pa.array(r["sums"]),
            }
        )

    # -- hub half-step: lookup a[dst] along edges, then sum by src -----
    def make_emit_hub(max_a: int):
        def emit_hub(t: pa.Table) -> pa.Table:
            ids_np = _np(t, "id")
            araw = _np(t, "araw")
            a = (araw * Q) // max_a
            dcols = [_np(t, c) for c in ("d0", "d1", "d2")]
            n = len(ids_np)
            # side 0: authority-value hosts; side 1: edge rows needing
            # that value; side 2: the node's carried row, passed through
            # to the hub sum untouched
            key = np.concatenate([ids_np, *dcols, ids_np])
            src = np.concatenate(
                [np.zeros(n, dtype=np.int64), ids_np, ids_np, ids_np, ids_np]
            )
            val = np.concatenate([a, np.zeros(3 * n, dtype=np.int64), np.zeros(n, dtype=np.int64)])
            av = np.concatenate([np.zeros(4 * n, dtype=np.int64), a])
            side = np.zeros(5 * n, dtype=np.int8)
            side[n : 4 * n] = 1
            side[4 * n :] = 2
            zeros = np.zeros(4 * n, dtype=np.int64)
            return pa.table(
                {
                    "_part": _part_column(
                        pa.chunked_array([pa.array(key)]), num_parts
                    ),
                    "_side": pa.array(side),
                    "key": pa.array(key),
                    "src": pa.array(src),
                    "val": pa.array(val),
                    "av": pa.array(av),
                    "d0": pa.array(np.concatenate([zeros, dcols[0]])),
                    "d1": pa.array(np.concatenate([zeros, dcols[1]])),
                    "d2": pa.array(np.concatenate([zeros, dcols[2]])),
                }
            )

        return emit_hub

    def lookup_hub(part: pa.Table) -> pa.Table:
        side = _np(part, "_side")
        key = _np(part, "key")
        src = _np(part, "src")
        val = _np(part, "val")
        hosts = side == 0
        hk = key[hosts]
        hv = val[hosts]
        order = np.argsort(hk)
        hk, hv = hk[order], hv[order]
        edges = side == 1
        ek, es = key[edges], src[edges]
        idx = np.searchsorted(hk, ek)
        if len(ek) and (
            len(hk) == 0
            or not np.array_equal(hk[np.minimum(idx, len(hk) - 1)], ek)
        ):
            raise ValueError(
                "hits lookup: an edge referenced an authority id absent "
                "from its partition's host set (ids must be dense)"
            )
        looked = hv[idx]
        passes = side == 2
        node = np.concatenate([es, key[passes]])
        out_val = np.concatenate([looked, np.zeros(int(passes.sum()), np.int64)])
        out_side = np.zeros(len(node), dtype=np.int8)
        out_side[len(es) :] = 1
        zero_e = np.zeros(len(es), dtype=np.int64)
        return pa.table(
            {
                "_part": _part_column(pa.chunked_array([pa.array(node)]), num_parts),
                "_side": pa.array(out_side),
                "key": pa.array(node),
                "val": pa.array(out_val),
                "av": pa.array(
                    np.concatenate([zero_e, _np(part, "av")[passes]])
                ),
                "d0": pa.array(np.concatenate([zero_e, _np(part, "d0")[passes]])),
                "d1": pa.array(np.concatenate([zero_e, _np(part, "d1")[passes]])),
                "d2": pa.array(np.concatenate([zero_e, _np(part, "d2")[passes]])),
            }
        )

    def reduce_hub(part: pa.Table) -> pa.Table:
        r = _sum_by_node(part, extra=("av",))
        return pa.table(
            {
                "id": pa.array(r["ids"]),
                "d0": pa.array(r["d0"]),
                "d1": pa.array(r["d1"]),
                "d2": pa.array(r["d2"]),
                "a": pa.array(r["av"]),
                "hraw": pa.array(r["sums"]),
            }
        )

    def make_scale_h(max_h: int):
        def scale_h(t: pa.Table) -> pa.Table:
            hraw = _np(t, "hraw")
            return pa.table(
                {
                    "id": t.column("id"),
                    "d0": t.column("d0"),
                    "d1": t.column("d1"),
                    "d2": t.column("d2"),
                    "a": t.column("a"),
                    "h": pa.array((hraw * Q) // max_h),
                }
            )

        return scale_h

    def _checked_max(ds: "ray.data.Dataset", col: str) -> int:
        m = int(ds.max(col))
        if m <= 0:
            raise ValueError(f"hits: max({col}) <= 0 — degenerate graph")
        if m >= _GUARD // Q:
            raise ValueError(
                f"hits int64 rescale headroom exceeded (max {col} = {m}); "
                "lower Q or shard the score scale explicitly"
            )
        return m

    for _ in range(iters):
        a_frontier = (
            frontier.map_batches(emit_auth, batch_format="pyarrow")
            .groupby("_part")
            .map_groups(reduce_auth, batch_format="pyarrow")
            .materialize()
        )
        max_a = _checked_max(a_frontier, "araw")
        h_frontier = (
            a_frontier.map_batches(make_emit_hub(max_a), batch_format="pyarrow")
            .groupby("_part")
            .map_groups(lookup_hub, batch_format="pyarrow")
            .groupby("_part")
            .map_groups(reduce_hub, batch_format="pyarrow")
            .materialize()
        )
        max_h = _checked_max(h_frontier, "hraw")
        frontier = h_frontier.map_batches(
            make_scale_h(max_h), batch_format="pyarrow"
        ).materialize()

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t.column("id"),
                "hub_q": t.column("h"),
                "auth_q": t.column("a"),
            }
        )

    return frontier.map_batches(project, batch_format="pyarrow")
