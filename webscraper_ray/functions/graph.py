"""Distributed connected components — duplicate-CLUSTER resolution.

The dedup family (minhash/simhash/ngram/embed) emits verified near-dup
PAIRS; a real curation pipeline needs the transitive closure of those
pairs — "these 9 docs are one duplicate cluster, keep one" — which no
pairwise operator gives. Ray Data has no graph primitive, so this is a
task-brief custom operator built as composition (a) from the brief's
ladder: hash-min label propagation (the classic BSP algorithm — every
node starts labeled with its own id; each round every node takes the
min over its closed neighborhood; converges in O(graph diameter)
rounds, and near-dup graphs are star/clique-shaped so the diameter is
tiny — the hot-band star caps in :mod:`.dedup` explicitly preserve
connectivity for exactly this use).

Scale shape (per round, E = directed edge count = 2x pairs, V = nodes):
- TWO hash-partition shuffles of 2-int64-column rows: edges+labels
  co-partitioned by ``src`` to emit (dst, label) messages, then
  messages+labels co-partitioned by node for the min-reduce. Nothing
  corpus-proportional — E and V are OUTPUT-sized (only docs in some
  candidate pair), the same bound the dedup verify joins live under.
- the per-round label frontier is materialized (V rows, 2 ints) — the
  standard iterative-algorithm checkpoint, like `clustering.py`'s
  centroid gather except it stays distributed; the driver sees ONE
  number per round (the changed-label count).
- rounds = graph diameter + 1 (the +1 detects convergence); a loud
  ``max_iters`` guard instead of a silent wrong answer.

Partitioning assumptions (documented per the brief): one partition's
edges fit in a worker's heap — ``num_parts`` is the unit of parallelism
and of memory; a giant star's edges land on the hub's partition (same
caveat as any hash join — the dedup star caps bound m at the source).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from .joins import _part_column

__all__ = [
    "connected_components",
    "attach_cluster_ids",
    "triangle_count",
    "triangles_per_node",
    "pointer_doubling",
    "random_walks",
    "wl_relabel",
]

_EMPTY_LABELS = pa.table(
    {"node": pa.array([], pa.int64()), "label": pa.array([], pa.int64())}
)


def _pairs_schema(a: str, b: str) -> pa.Table:
    return pa.table({a: pa.array([], pa.int64()), b: pa.array([], pa.int64())})


SMALL_GRAPH_GATHER_MAX = 500_000  # pairs (~8 MB of int64 edges)


def _unionfind_cc(parts: list, a_col: str, b_col: str) -> pa.Table:
    """Exact union-find with min-root labels — the small-graph plan."""
    a = np.concatenate(
        [t.column(a_col).to_numpy(zero_copy_only=False) for t in parts]
    ).astype(np.int64)
    b = np.concatenate(
        [t.column(b_col).to_numpy(zero_copy_only=False) for t in parts]
    ).astype(np.int64)
    nodes = np.unique(np.concatenate([a, b]))
    idx = {int(n): i for i, n in enumerate(nodes)}
    parent = np.arange(len(nodes))

    def find(i: int) -> int:
        while parent[i] != i:
            parent[i] = parent[parent[i]]  # path halving
            i = parent[i]
        return i

    for x, y in zip(a, b):
        rx, ry = find(idx[int(x)]), find(idx[int(y)])
        if rx != ry:
            # union by MIN NODE ID so the root is the component label
            if nodes[rx] < nodes[ry]:
                parent[ry] = rx
            else:
                parent[rx] = ry
    labels = np.array([nodes[find(i)] for i in range(len(nodes))])
    return pa.table({"node": pa.array(nodes), "label": pa.array(labels)})


def connected_components(
    pairs: "ray.data.Dataset",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    num_parts: int = 32,
    max_iters: int = 50,
    small_gather_max: int = SMALL_GRAPH_GATHER_MAX,
) -> "ray.data.Dataset":
    """(node, label) for every node in ``pairs``; ``label`` is the min
    node id of the node's connected component. Deterministic and
    parallelism-invariant (min is order-free).

    Size-gated plan (the join-planner discipline): a near-dup pair graph
    is OUTPUT-sized, and at bench scale it is a few hundred edges — five
    BSP rounds of two exchanges each are pure scheduling overhead there.
    At or under ``small_gather_max`` pairs the edge list gathers once
    and an exact min-root union-find labels it driver-side (identical
    output by construction); above the gate the distributed hash-min
    label propagation below runs unchanged."""
    import ray as _ray

    # materialize ONCE: the pair set is output-sized, and counting a
    # LAZY upstream (the whole minhash chain) and then gathering it
    # would execute that chain twice (measured: dup_clusters 6.8 -> 19 s
    # under load before this pin)
    pairs = pairs.select_columns([a_col, b_col]).materialize()
    n_pairs = pairs.count()
    if 0 < n_pairs <= small_gather_max:
        parts = [t for t in _ray.get(pairs.to_arrow_refs()) if t.num_rows]
        return ray.data.from_arrow(_unionfind_cc(parts, a_col, b_col))

    def both_dirs(t: pa.Table) -> pa.Table:
        a = t.column(a_col).to_numpy(zero_copy_only=False).astype(np.int64)
        b = t.column(b_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, b])),
                "dst": pa.array(np.concatenate([b, a])),
            }
        )

    edges = pairs.map_batches(both_dirs, batch_format="pyarrow").materialize()
    if edges.count() == 0:
        return ray.data.from_arrow(_EMPTY_LABELS)

    # initial frontier: every endpoint labeled with itself (distinct via
    # the same hash-partition + np.unique the dedup family uses)
    def self_label(t: pa.Table) -> pa.Table:
        nodes = np.unique(t.column("src").to_numpy(zero_copy_only=False))
        return pa.table({"node": pa.array(nodes), "label": pa.array(nodes)})

    def dedup_nodes(part: pa.Table) -> pa.Table:
        nodes = np.unique(part.column("node").to_numpy(zero_copy_only=False))
        return pa.table({"node": pa.array(nodes), "label": pa.array(nodes)})

    labels = (
        edges.map_batches(self_label, batch_format="pyarrow")
        .map_batches(
            lambda t: t.append_column(
                "_part", _part_column(t.column("node"), num_parts)
            ),
            batch_format="pyarrow",
        )
        .groupby("_part")
        .map_groups(dedup_nodes, batch_format="pyarrow")
        .materialize()
    )

    # union schema for both per-round shuffles: (_part, _side, a, b)
    #   join step:   side 0 edge (src, dst)      side 1 label (node, label)
    #   reduce step: side 0 msg  (node, label)   side 1 label (node, old)
    def tag(side: int, x_col: str, y_col: str, parts: int):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "_part": _part_column(t.column(x_col), parts),
                    "_side": pa.array(
                        np.full(t.num_rows, side, dtype=np.int8)
                    ),
                    "a": t.column(x_col),
                    "b": t.column(y_col),
                }
            )

        return fn

    def emit_messages(part: pa.Table) -> pa.Table:
        side = part.column("_side").to_numpy(zero_copy_only=False)
        a = part.column("a").to_numpy(zero_copy_only=False)
        b = part.column("b").to_numpy(zero_copy_only=False)
        lbl_mask = side == 1
        nodes, lbls = a[lbl_mask], b[lbl_mask]
        order = np.argsort(nodes)
        nodes, lbls = nodes[order], lbls[order]
        src, dst = a[~lbl_mask], b[~lbl_mask]
        # every edge endpoint is in the label frontier by construction
        return pa.table(
            {
                "node": pa.array(dst),
                "label": pa.array(lbls[np.searchsorted(nodes, src)]),
            }
        )

    def min_reduce(part: pa.Table) -> pa.Table:
        side = part.column("_side").to_numpy(zero_copy_only=False)
        a = part.column("a").to_numpy(zero_copy_only=False)
        b = part.column("b").to_numpy(zero_copy_only=False)
        old_mask = side == 1
        old_nodes, old_lbls = a[old_mask], b[old_mask]
        order = np.argsort(old_nodes)
        old_nodes, old_lbls = old_nodes[order], old_lbls[order]
        mn, ml = a[~old_mask], b[~old_mask]
        incoming = np.full(old_nodes.shape, np.iinfo(np.int64).max)
        np.minimum.at(incoming, np.searchsorted(old_nodes, mn), ml)
        new = np.minimum(old_lbls, incoming)
        return pa.table(
            {
                "node": pa.array(old_nodes),
                "label": pa.array(new),
                "changed": pa.array((new < old_lbls).astype(np.int8)),
            }
        )

    for _ in range(max_iters):
        msgs = (
            edges.map_batches(tag(0, "src", "dst", num_parts), batch_format="pyarrow")
            .union(
                labels.map_batches(
                    tag(1, "node", "label", num_parts), batch_format="pyarrow"
                )
            )
            .groupby("_part")
            .map_groups(emit_messages, batch_format="pyarrow")
        )
        step = (
            msgs.map_batches(tag(0, "node", "label", num_parts), batch_format="pyarrow")
            .union(
                labels.map_batches(
                    tag(1, "node", "label", num_parts), batch_format="pyarrow"
                )
            )
            .groupby("_part")
            .map_groups(min_reduce, batch_format="pyarrow")
            .materialize()
        )
        changed = step.sum("changed") or 0
        # CRITICAL: re-bound the frontier's block count every round. The
        # groupby sort's output block count tracks its INPUT block count
        # (union = edge blocks + label blocks), so without this coalesce
        # the frontier's blocks grow ~2x per round — by round 8 a 10-node
        # graph fans a sort over thousands of KB blocks and the driver
        # melts building O(blocks^2) shuffle refs. One cheap split/merge
        # exchange of frontier-sized 2-int64 rows keeps every round O(1)
        # blocks for the life of the loop.
        labels = (
            step.drop_columns(["changed"]).repartition(num_parts).materialize()
        )
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iters} rounds — "
        "graph diameter exceeds the guard; raise max_iters explicitly"
    )


def attach_cluster_ids(
    docs: "ray.data.Dataset",
    components: "ray.data.Dataset",
    id_col: str = "doc_id",
    num_parts: int = 32,
) -> "ray.data.Dataset":
    """Left-attach component labels to the FULL corpus: docs in no pair
    become singleton clusters of themselves. One hash-partition shuffle
    of (id) + (node, label) rows; the corpus side ships the id column
    only — project upstream."""

    def tag_docs(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "_part": _part_column(t.column(id_col), num_parts),
                "_side": pa.array(np.zeros(t.num_rows, dtype=np.int8)),
                "a": t.column(id_col),
                # zero filler, NOT pa.nulls: a nullable int64 column
                # converts to float64 in to_numpy and silently corrupts
                # ids above 2^53; side-0 rows never read b
                "b": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
            }
        )

    def tag_labels(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "_part": _part_column(t.column("node"), num_parts),
                "_side": pa.array(np.ones(t.num_rows, dtype=np.int8)),
                "a": t.column("node"),
                "b": t.column("label"),
            }
        )

    def attach(part: pa.Table) -> pa.Table:
        side = part.column("_side").to_numpy(zero_copy_only=False)
        a = part.column("a").to_numpy(zero_copy_only=False)
        lbl_mask = side == 1
        nodes = a[lbl_mask]
        lbls = part.column("b").to_numpy(zero_copy_only=False)[lbl_mask]
        order = np.argsort(nodes)
        nodes, lbls = nodes[order], lbls[order]
        ids = a[~lbl_mask].astype(np.int64)
        cluster = ids.copy()
        if nodes.size:
            idx = np.searchsorted(nodes, ids)
            found = (idx < nodes.size) & (nodes[np.minimum(idx, nodes.size - 1)] == ids)
            cluster[found] = lbls[idx[found]]
        return pa.table(
            {
                id_col: pa.array(ids),
                "cluster_id": pa.array(cluster),
                "is_canonical": pa.array((cluster == ids).astype(np.int64)),
            }
        )

    return (
        docs.map_batches(tag_docs, batch_format="pyarrow")
        .union(components.map_batches(tag_labels, batch_format="pyarrow"))
        .groupby("_part")
        .map_groups(attach, batch_format="pyarrow")
    )



def _closed_wedges(
    edges: "ray.data.Dataset", num_partitions: int
) -> "ray.data.Dataset | None":
    """Shared wedge builder for the triangle family: hash-partition the
    oriented edge list on ``a``, emit each center's ``triu`` pairs WITH
    the center column, and close them against the edge list with one
    partitioned two-key join. Returns None when no wedges exist (a
    matching-shaped or empty graph) — Ray normalizes an all-empty
    dataset to schema-less blocks that would crash the join."""
    # the edge list is consumed twice (wedge emission + closure probe);
    # materialize so a lazy upstream derivation never executes twice
    edges = edges.materialize()
    empty = pa.table(
        {
            "a": pa.array([], pa.int64()),
            "b": pa.array([], pa.int64()),
            "center": pa.array([], pa.int64()),
        }
    )

    def add_part(t: pa.Table) -> pa.Table:
        return t.append_column("_part", _part_column(t.column("a"), num_partitions))

    def emit_wedges(part: pa.Table) -> pa.Table:
        if part.num_rows < 2:
            return empty
        a = part.column("a").to_numpy(zero_copy_only=False).astype(np.int64)
        b = part.column("b").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        change = np.flatnonzero(a[1:] != a[:-1]) + 1
        starts = np.concatenate([[0], change])
        ends = np.concatenate([change, [len(a)]])
        out_x: list[np.ndarray] = []
        out_y: list[np.ndarray] = []
        out_c: list[np.ndarray] = []
        for s, e in zip(starts, ends):
            m = int(e - s)
            if m < 2:
                continue
            g = b[s:e]  # ascending (lexsort), so x < y holds per pair
            ii, jj = np.triu_indices(m, k=1)
            out_x.append(g[ii])
            out_y.append(g[jj])
            out_c.append(np.full(len(ii), a[s], dtype=np.int64))
        if not out_x:
            return empty
        return pa.table(
            {
                "a": pa.array(np.concatenate(out_x)),
                "b": pa.array(np.concatenate(out_y)),
                "center": pa.array(np.concatenate(out_c)),
            }
        )

    wedges = (
        edges.map_batches(add_part, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(emit_wedges, batch_format="pyarrow")
        .materialize()  # wedge-volume sized; the join would hold it anyway
    )
    if wedges.count() == 0:
        return None
    return wedges.join(
        edges,
        join_type="inner",
        num_partitions=num_partitions,
        on=("a", "b"),
    )


def triangle_count(
    edges: "ray.data.Dataset",
    num_partitions: int = 16,
) -> int:
    """Exact triangle count over an undirected edge Dataset ``(a, b)``
    with ``a < b`` and no duplicates (the orientation dedupe is the
    caller's — see ``queries.q_link_triangles``).

    The classic two-exchange node-iterator with ORIENTATION: because
    every edge is stored low-id -> high-id, each triangle ``p<q<r`` is
    found exactly once — as the wedge ``(q, r)`` centered at ``p``
    closed by the oriented edge ``(q, r)``. No post-hoc /3 division, no
    double counting to reason away.

    Scale shape:
    - ONE hash-partition exchange of the edge list on ``a``; wedges emit
      per partition via one lexsort + per-center ``triu`` (the
      ``_band_candidates`` emission kernel) — wedge volume is
      sum(out_deg^2)/2, the algorithm's intrinsic cost;
    - ONE partitioned inner join of wedges against the edge list on
      ``(a, b)`` (``Dataset.join``) — the closure probe;
    - the driver sees a single count.

    Partitioning assumption (per the brief): a hub node's out-edges land
    in one partition; ordering by id is a proxy for the degree ordering
    the literature uses, so a low-id hub still concentrates wedges.
    Callers with power-law graphs should relabel ids by ascending degree
    first (one extra exchange) to restore the O(E^{3/2}) bound.
    """
    closed = _closed_wedges(edges, num_partitions)
    return 0 if closed is None else closed.count()


def triangles_per_node(
    edges: "ray.data.Dataset",
    num_partitions: int = 16,
) -> "ray.data.Dataset":
    """(node, n_tri) — per-node triangle membership counts over an
    oriented (a < b, deduped) edge Dataset. Same two-exchange shape as
    :func:`triangle_count`, but wedges CARRY their center so the closure
    join yields full (center, a, b) triangles; each contributes one
    count to all three vertices via a flat emission + one node-keyed
    reduce."""
    empty_out = pa.table(
        {"node": pa.array([], pa.int64()), "n_tri": pa.array([], pa.int64())}
    )
    closed = _closed_wedges(edges, num_partitions)
    if closed is None:
        return ray.data.from_arrow(empty_out)

    def per_node_partial(t: pa.Table) -> pa.Table:
        nodes = np.concatenate(
            [
                t.column("center").to_numpy(zero_copy_only=False),
                t.column("a").to_numpy(zero_copy_only=False),
                t.column("b").to_numpy(zero_copy_only=False),
            ]
        )
        u, c = np.unique(nodes, return_counts=True)
        return pa.table(
            {
                "node": pa.array(u.astype(np.int64)),
                "n_tri": pa.array(c.astype(np.int64)),
            }
        )

    from ray.data.aggregate import Sum

    return (
        closed.map_batches(per_node_partial, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Sum("n_tri", alias_name="n_tri"))
    )


_EMPTY_RESOLVED = pa.table(
    {
        "node": pa.array([], pa.int64()),
        "final": pa.array([], pa.int64()),
        "hops": pa.array([], pa.int64()),
    }
)


def pointer_doubling(
    pointers: "ray.data.Dataset",
    node_col: str = "node",
    next_col: str = "next",
    num_parts: int = 16,
    max_rounds: int = 40,
) -> "ray.data.Dataset":
    """(node, final, hops) for every node of a successor forest — chain
    resolution by pointer doubling (pointer jumping, the classic PRAM /
    BSP primitive): each round every node replaces ``p <- p[p]`` and
    ``h <- h + h[p]``, so after ``ceil(log2(L)) + 1`` rounds (L = the
    longest chain) every pointer is its chain's terminal and ``hops``
    is the exact edge count to it. The crawl-domain use is redirect
    chains — resolving every URL to its final destination — where a
    naive one-hop-per-round walk needs L shuffles and this needs log L.

    Input contract: every ``next`` value is itself a node present in
    the input (checked loudly per partition, not silently mis-merged);
    a TERMINAL node points to itself. A cycle of length > 1 never
    converges and trips the ``max_rounds`` guard rather than returning
    a wrong answer.

    Scale shape, per round: ONE hash-partition exchange of 3-int64-
    column rows — the node table tagged twice (side 0 keyed by its
    current pointer for the jump lookup, side 1 keyed by node as the
    lookup table), the `connected_components` tagged-union shuffle
    shape. The table is corpus-sized but 24 B/row; rounds are
    logarithmic in chain length, and the driver sees one number per
    round (the changed count)."""

    def seed(t: pa.Table) -> pa.Table:
        node = t.column(node_col).to_numpy(zero_copy_only=False).astype(np.int64)
        nxt = t.column(next_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "node": pa.array(node),
                "ptr": pa.array(nxt),
                "hops": pa.array((nxt != node).astype(np.int64)),
            }
        )

    state = pointers.map_batches(seed, batch_format="pyarrow").materialize()
    if state.count() == 0:
        return ray.data.from_arrow(_EMPTY_RESOLVED)

    def tag(side: int, key_col: str):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "_part": _part_column(t.column(key_col), num_parts),
                    "_side": pa.array(np.full(t.num_rows, side, dtype=np.int8)),
                    "a": t.column("node"),
                    "b": t.column("ptr"),
                    "c": t.column("hops"),
                }
            )

        return fn

    def jump(part: pa.Table) -> pa.Table:
        side = part.column("_side").to_numpy(zero_copy_only=False)
        a = part.column("a").to_numpy(zero_copy_only=False)
        b = part.column("b").to_numpy(zero_copy_only=False)
        c = part.column("c").to_numpy(zero_copy_only=False)
        lut = side == 1
        lut_nodes, lut_ptr, lut_hops = a[lut], b[lut], c[lut]
        order = np.argsort(lut_nodes)
        lut_nodes = lut_nodes[order]
        lut_ptr, lut_hops = lut_ptr[order], lut_hops[order]
        node, q, h = a[~lut], b[~lut], c[~lut]
        idx = np.searchsorted(lut_nodes, q)
        if idx.size and (
            np.any(idx >= lut_nodes.size) or np.any(lut_nodes[idx] != q)
        ):
            raise ValueError(
                "pointer_doubling: a next pointer references a missing node"
            )
        p2 = lut_ptr[idx]
        return pa.table(
            {
                "node": pa.array(node),
                "ptr": pa.array(p2),
                "hops": pa.array(h + lut_hops[idx]),
                "changed": pa.array((p2 != q).astype(np.int8)),
            }
        )

    for _ in range(max_rounds):
        # ONE materialize per round: the block-count re-bound
        # (see connected_components) is fused into the round's own
        # exchange instead of a second barrier, and the changed-count
        # is a cheap second pass over the already-materialized blocks
        state = (
            state.map_batches(tag(0, "ptr"), batch_format="pyarrow")
            .union(state.map_batches(tag(1, "node"), batch_format="pyarrow"))
            .groupby("_part")
            .map_groups(jump, batch_format="pyarrow")
            .repartition(num_parts)
            .materialize()
        )
        changed = state.sum("changed") or 0
        state = state.drop_columns(["changed"])
        if changed == 0:
            # an EVEN-length cycle collapses to self-pointers with
            # nonzero hops and would otherwise read as converged (odd
            # cycles keep changing and trip the round guard); a genuine
            # terminal always has hops == 0, so this one aggregate
            # catches every cycle member loudly
            def cyc(t: pa.Table) -> pa.Table:
                n = t.column("node").to_numpy(zero_copy_only=False)
                p = t.column("ptr").to_numpy(zero_copy_only=False)
                h = t.column("hops").to_numpy(zero_copy_only=False)
                return pa.table(
                    {"n_cyc": pa.array([int(np.sum((n == p) & (h > 0)))])}
                )

            n_cyc = (
                state.map_batches(cyc, batch_format="pyarrow").sum("n_cyc") or 0
            )
            if n_cyc:
                raise RuntimeError(
                    f"pointer_doubling did not converge: {n_cyc} nodes sit "
                    "on a pointer cycle (no terminal reachable)"
                )
            return state.map_batches(
                lambda t: t.rename_columns(["node", "final", "hops"]),
                batch_format="pyarrow",
            )
    raise RuntimeError(
        f"pointer_doubling did not converge in {max_rounds} rounds — "
        "the pointer graph contains a cycle or an unexpectedly long chain"
    )


def random_walks(
    edges: "ray.data.Dataset",
    starts: "ray.data.Dataset",
    steps: int = 3,
    num_parts: int = 16,
    salt: str = "rw",
) -> "ray.data.Dataset":
    """Deterministic md5-guided random walks over a DISTINCT directed
    edge table — the graph-sampling primitive under node2vec/DeepWalk
    embeddings and crawl-frontier exploration, made parallelism-
    invariant (and SQL-reproducible) by replacing the RNG with the
    repo's md5 family: at step ``s`` a walker at node ``u`` moves to
    its ``(md5(salt:u:s) mod deg(u)))``-th out-neighbor in ascending
    dst order.

    Input contract: ``edges`` is (src, dst) DISTINCT and every reached
    node has deg >= 1 (checked loudly per partition — a sink node would
    silently truncate walks otherwise). ``starts`` is (doc_id,).

    Scale shape, per step: ONE hash-partition exchange in the
    `pointer_doubling` tagged-union shape — walkers keyed by their
    current node, edge rows keyed by src, so each partition resolves
    its walkers with a vectorized lexsort + searchsorted (the only
    per-row Python is the md5 itself, pagerank's documented cost).
    Step tables join back on doc_id (distributed, output-sized)."""
    import ray as _ray

    from .dedup import md5_u64

    def seed(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"doc_id": pa.array(ids), "cur": pa.array(ids)})

    state = starts.map_batches(seed, batch_format="pyarrow")
    edges = edges.materialize()  # reused once per step

    def tag_walk(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "_part": _part_column(t.column("cur"), num_parts),
                "_side": pa.array(np.zeros(t.num_rows, dtype=np.int8)),
                "a": t.column("doc_id"),
                "b": t.column("cur"),
            }
        )

    def tag_edge(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "_part": _part_column(t.column("src"), num_parts),
                "_side": pa.array(np.ones(t.num_rows, dtype=np.int8)),
                "a": t.column("src"),
                "b": t.column("dst"),
            }
        )

    def make_choose(s: int):
        def choose(part: pa.Table) -> pa.Table:
            side = part.column("_side").to_numpy(zero_copy_only=False)
            a = part.column("a").to_numpy(zero_copy_only=False)
            b = part.column("b").to_numpy(zero_copy_only=False)
            lut = side == 1
            esrc, edst = a[lut], b[lut]
            order = np.lexsort((edst, esrc))
            esrc, edst = esrc[order], edst[order]
            doc, cur = a[~lut], b[~lut]
            lo = np.searchsorted(esrc, cur, side="left")
            hi = np.searchsorted(esrc, cur, side="right")
            deg = hi - lo
            if np.any(deg == 0):
                bad = int(cur[np.flatnonzero(deg == 0)[0]])
                raise ValueError(f"random_walks: node {bad} has no out-edges")
            h = np.fromiter(
                (md5_u64(f"{salt}:{c}:{s}") for c in cur),
                dtype=np.uint64,
                count=cur.size,
            )
            nxt = edst[lo + (h % deg.astype(np.uint64)).astype(np.int64)]
            return pa.table({"doc_id": pa.array(doc), "cur": pa.array(nxt)})

        return choose

    step_tables = []
    for s in range(steps):
        walkers = state.map_batches(tag_walk, batch_format="pyarrow")
        lut = edges.map_batches(tag_edge, batch_format="pyarrow")
        state = (
            walkers.union(lut)
            .groupby("_part")
            .map_groups(make_choose(s), batch_format="pyarrow")
            .materialize()
        )
        step_tables.append(state)

    # join-back via ONE tagged-union pivot exchange, NOT chained
    # Dataset.joins: two 16-partition JoinOperators in one streaming
    # plan allocate two aggregator-actor pools whose combined CPU
    # reservation starves the upstream map tasks at low CPU counts —
    # measured hard deadlock at num_cpus=4 (the suite's session size),
    # while the same plan passes at 32. The pivot is also strictly
    # cheaper: one walker-keyed exchange of (step, doc, v) rows.
    def tag_step(i: int):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "_part": _part_column(t.column("doc_id"), num_parts),
                    "step": pa.array(np.full(t.num_rows, i, dtype=np.int64)),
                    "doc_id": t.column("doc_id"),
                    "v": t.column("cur"),
                }
            )

        return fn

    tagged = [
        st.map_batches(tag_step(i), batch_format="pyarrow")
        for i, st in enumerate(step_tables, start=1)
    ]
    u = tagged[0].union(*tagged[1:]) if len(tagged) > 1 else tagged[0]

    def pivot(part: pa.Table) -> pa.Table:
        step = part.column("step").to_numpy(zero_copy_only=False)
        doc = part.column("doc_id").to_numpy(zero_copy_only=False)
        v = part.column("v").to_numpy(zero_copy_only=False)
        order = np.lexsort((step, doc))
        doc, step, v = doc[order], step[order], v[order]
        n_docs, rem = divmod(doc.size, steps)
        if rem or (
            n_docs and not np.array_equal(
                step.reshape(n_docs, steps),
                np.broadcast_to(np.arange(1, steps + 1), (n_docs, steps)),
            )
        ):
            raise ValueError("random_walks: walker lost a step row")
        cols = {"doc_id": pa.array(doc[::steps])}
        vm = v.reshape(n_docs, steps) if n_docs else v.reshape(0, steps)
        for i in range(steps):
            cols[f"v{i + 1}"] = pa.array(vm[:, i])
        return pa.table(cols)

    return u.groupby("_part").map_groups(pivot, batch_format="pyarrow")


def wl_relabel(
    ids: "ray.data.Dataset",
    n_nodes: int,
    iters: int = 2,
    num_parts: int = 16,
    prefix: str = "pr",
) -> "ray.data.Dataset":
    """Weisfeiler–Lehman iterative relabeling over the derived directed
    graph (Weisfeiler & Leman 1968; the WL graph-kernel of
    Shervashidze et al., JMLR'11) — the canonical graph-fingerprinting
    primitive: after ``iters`` rounds, two nodes share a label only if
    their ``iters``-hop out-neighborhood trees are isomorphic. Start
    label = in-degree; round t+1: ``md5(label | sorted multiset of the
    3 out-neighbors' labels)[:16]``.

    Scale shape, per round: TWO tagged-union hash exchanges (the
    `hits`/`pointer_doubling` shape) — label hosts meet the edge rows
    that need them (keyed by neighbor id), then resolved (node,
    neighbor-label) messages meet each node's own carried label (keyed
    by node). Rows are node/edge-sized; the per-node md5+join is the
    pagerank-class documented Python cost. The out-link family is
    pagerank's (`_out_links(prefix)`), so DuckDB replays every round
    with string_agg(ORDER BY) + md5 CTEs."""
    import hashlib

    import ray as _ray  # noqa: F401

    from .joins import _part_column
    from .pagerank import _out_links

    def seed_edges(t: pa.Table) -> pa.Table:
        u = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        outs = _out_links(u, n_nodes, prefix=prefix)
        return pa.table(
            {
                "src": pa.array(np.concatenate([u] * 3)),
                "dst": pa.array(np.concatenate(outs)),
            }
        )

    edges = ids.map_batches(seed_edges, batch_format="pyarrow").materialize()

    def ind_partial(t: pa.Table) -> pa.Table:
        g = t.select(["dst"]).group_by("dst").aggregate([("dst", "count")])
        return g.rename_columns(["node", "d"])

    from ray.data.aggregate import Sum

    indeg = (
        edges.map_batches(ind_partial, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Sum("d", alias_name="d"))
    )

    def seed_labels(t: pa.Table) -> pa.Table:
        d = t.column("d").to_numpy(zero_copy_only=False)
        d = np.nan_to_num(d.astype(np.float64)).astype(np.int64)
        labs = [f"d{int(x)}" for x in d]
        return pa.table(
            {"node": t.column("node"), "lab": pa.array(labs, pa.string())}
        )

    ids_tbl = ids.map_batches(
        lambda t: pa.table({"node": t.column("doc_id")}),
        batch_format="pyarrow",
    )
    labels = (
        ids_tbl.join(indeg, "left_outer", num_partitions=num_parts, on=("node",))
        .map_batches(seed_labels, batch_format="pyarrow")
        .materialize()
    )

    def tag_hosts(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "_part": _part_column(t.column("node"), num_parts),
                "_side": pa.array(np.zeros(n, dtype=np.int8)),
                "key": t.column("node"),
                "src": pa.array(np.zeros(n, dtype=np.int64)),
                "lab": t.column("lab"),
            }
        )

    def tag_edges(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "_part": _part_column(t.column("dst"), num_parts),
                "_side": pa.array(np.ones(n, dtype=np.int8)),
                "key": t.column("dst"),
                "src": t.column("src"),
                "lab": pa.array([""] * n, pa.string()),
            }
        )

    def lookup(part: pa.Table) -> pa.Table:
        side = part.column("_side").to_numpy(zero_copy_only=False)
        key = part.column("key").to_numpy(zero_copy_only=False)
        src = part.column("src").to_numpy(zero_copy_only=False)
        lab = np.asarray(part.column("lab").to_pylist(), dtype=object)
        hosts = side == 0
        hk, hl = key[hosts], lab[hosts]
        order = np.argsort(hk)
        hk, hl = hk[order], hl[order]
        edges_m = ~hosts
        ek, es = key[edges_m], src[edges_m]
        idx = np.searchsorted(hk, ek)
        if len(ek) and (
            len(hk) == 0 or not np.array_equal(hk[np.minimum(idx, len(hk) - 1)], ek)
        ):
            raise ValueError("wl_relabel: edge referenced an absent node id")
        return pa.table(
            {
                "_part": _part_column(
                    pa.chunked_array([pa.array(es)]), num_parts
                ),
                "_side": pa.array(np.zeros(len(es), dtype=np.int8)),
                "key": pa.array(es),
                "lab": pa.array(list(hl[idx]), pa.string()),
            }
        )

    def tag_self(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "_part": _part_column(t.column("node"), num_parts),
                "_side": pa.array(np.ones(n, dtype=np.int8)),
                "key": t.column("node"),
                "lab": t.column("lab"),
            }
        )

    def refine(part: pa.Table) -> pa.Table:
        side = part.column("_side").to_numpy(zero_copy_only=False)
        key = part.column("key").to_numpy(zero_copy_only=False)
        lab = np.asarray(part.column("lab").to_pylist(), dtype=object)
        order = np.lexsort((lab, side, key))
        key, side, lab = key[order], side[order], lab[order]
        starts = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
        ends = np.r_[starts[1:], key.size]
        nodes, labs = [], []
        for s, e in zip(starts, ends):
            own = lab[s:e][side[s:e] == 1]
            if own.size != 1:
                raise ValueError("wl_relabel: node missing its carried label")
            neigh = lab[s:e][side[s:e] == 0]
            # neigh is already lab-sorted within the (key, side=0) run
            payload = own[0] + "|" + ",".join(neigh)
            nodes.append(int(key[s]))
            labs.append(hashlib.md5(payload.encode()).hexdigest()[:16])
        return pa.table(
            {
                "node": pa.array(nodes, pa.int64()),
                "lab": pa.array(labs, pa.string()),
            }
        )

    for _ in range(iters):
        looked = (
            labels.map_batches(tag_hosts, batch_format="pyarrow")
            .union(edges.map_batches(tag_edges, batch_format="pyarrow"))
            .groupby("_part")
            .map_groups(lookup, batch_format="pyarrow")
        )
        labels = (
            looked.union(labels.map_batches(tag_self, batch_format="pyarrow"))
            .groupby("_part")
            .map_groups(refine, batch_format="pyarrow")
            .materialize()
        )

    return labels.map_batches(
        lambda t: t.rename_columns(["doc_id", "wl"]), batch_format="pyarrow"
    )


def kcore_members(
    edges: "ray.data.Dataset",
    k: int = 3,
    iters: int = 8,
    num_partitions: int = 8,
) -> "ray.data.Dataset":
    """Fixed-round k-core peeling (Seidman 1983; the Batagelj-Zaversnik
    peel expressed as BSP rounds) over an UNDIRECTED edge set given as
    symmetric directed rows — ``(u,v)`` AND ``(v,u)`` present, so a
    node's degree is its ``src`` row count and every endpoint occurs as
    a ``src`` somewhere (the symmetry the dst-check relies on). Node
    ids must be NON-NEGATIVE (alive markers use a sign sentinel on the
    shared exchange schema) — guarded loudly per batch.

    Exactly ``iters`` rounds run — no early stop, no data-dependent
    round count — so the chained-CTE SQL oracle replays the identical
    rounds and the gate is exact whether or not the peel has converged
    (after the fixpoint extra rounds are no-ops; convergence inside 8
    rounds on the test corpora is pinned by a unit test).

    Scale shape per round: exactly TWO sort-shuffle exchanges, no
    groupby().aggregate() (Ray's hash-aggregate spawns a new shuffle
    actor pool per call; in an 8-round loop those pools accumulate and
    starve low-CPU sessions — measured hang, hence the map_groups-only
    discipline shared with pagerank/wl_relabel):

    1. src-keyed: per-src row counts ARE degrees (the partition holds
       every row of its srcs); drop rows of dead srcs, re-key the
       survivors by dst, and emit one alive-marker row per alive src;
    2. dst-keyed: drop rows whose dst has no alive marker (sorted
       ``searchsorted`` membership), emitting clean (src, dst).

    The alive set never gathers or broadcasts; output: every node in
    the round-``iters`` core with its within-core degree.
    """

    def _src_round(t: pa.Table) -> pa.Table:
        src = t.column("src").to_numpy(zero_copy_only=False)
        dst = t.column("dst").to_numpy(zero_copy_only=False)
        order = np.argsort(src, kind="stable")
        src_s, dst_s = src[order], dst[order]
        starts = np.flatnonzero(np.r_[True, src_s[1:] != src_s[:-1]])
        sizes = np.diff(np.r_[starts, src_s.size])
        alive_grp = sizes >= k
        keep = np.repeat(alive_grp, sizes)
        es, ed = src_s[keep], dst_s[keep]
        alive_nodes = src_s[starts][alive_grp]
        part_e = _part_column(
            pa.chunked_array([pa.array(ed)]), num_partitions
        ).to_numpy(zero_copy_only=False)
        part_a = _part_column(
            pa.chunked_array([pa.array(alive_nodes)]), num_partitions
        ).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "_part": pa.array(np.concatenate([part_e, part_a])),
                "src": pa.array(
                    np.concatenate([es, np.full(alive_nodes.size, -1, np.int64)])
                ),
                "dst": pa.array(
                    np.concatenate([ed, np.full(alive_nodes.size, -1, np.int64)])
                ),
                "n": pa.array(
                    np.concatenate([np.full(es.size, -1, np.int64), alive_nodes])
                ),
            }
        )

    def _dst_round(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False)
        is_marker = n >= 0
        ref = np.sort(n[is_marker])
        src = t.column("src").to_numpy(zero_copy_only=False)[~is_marker]
        dst = t.column("dst").to_numpy(zero_copy_only=False)[~is_marker]
        if ref.size == 0:
            keep = np.zeros(dst.size, dtype=bool)
        else:
            pos = np.clip(np.searchsorted(ref, dst), 0, ref.size - 1)
            keep = ref[pos] == dst
        return pa.table({"src": pa.array(src[keep]), "dst": pa.array(dst[keep])})

    def _tag_src(t: pa.Table) -> pa.Table:
        src = t.column("src").to_numpy(zero_copy_only=False)
        if src.size and int(src.min()) < 0:
            # alive markers ride the exchange as n >= 0 rows; a negative
            # node id would be mistaken for a marker sentinel — refuse
            # loudly (remap hash-derived ids to unsigned-view offsets
            # upstream if needed)
            raise ValueError(
                "kcore_members requires non-negative node ids "
                f"(got {int(src.min())})"
            )
        return t.append_column(
            "_part", _part_column(t.column("src"), num_partitions)
        )

    cur = edges.materialize()
    for _ in range(iters):
        cur = (
            cur.map_batches(_tag_src, batch_format="pyarrow")
            .groupby("_part")
            .map_groups(_src_round, batch_format="pyarrow")
            .groupby("_part")
            .map_groups(_dst_round, batch_format="pyarrow")
            .materialize()
        )

    def _degrees(t: pa.Table) -> pa.Table:
        src = t.column("src").to_numpy(zero_copy_only=False)
        uniq, counts = np.unique(src, return_counts=True)
        return pa.table(
            {
                "doc_id": pa.array(uniq, pa.int64()),
                "deg": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    return (
        cur.map_batches(_tag_src, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(_degrees, batch_format="pyarrow")
    )
