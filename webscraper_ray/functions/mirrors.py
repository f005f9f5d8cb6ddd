"""Mirror-host detection: content overlap between HOST PAIRS.

Crawlers deduplicate site MIRRORS (the same content served from many
hostnames — Bharat & Broder, WWW'99 "mirror detection on the web") by
measuring each host pair's shared-content fraction and collapsing pairs
above a threshold. Doc-level dedup can't see this (mirrored pages often
differ in chrome); the standard signal is the Jaccard overlap of the
hosts' content-fingerprint SETS — here the 12-word paragraph windows of
:mod:`.paradedup` (reused verbatim, so the SQL gate replays the exact
same fingerprints).

Scale shape — the inverted-index pair-counting pattern (the copurchase /
token-cooccurrence shape applied to hosts):
- per-batch kernel ships (para_hash, host) — 8-B hash + dict-encoded
  label;
- ONE hash-partition exchange keyed by para_hash; each partition
  dedups (hash, host), emits host PAIRS per shared hash plus per-host
  distinct-fingerprint partials (each (hash, host) lives in exactly one
  partition, so partial counts sum globally) — hosts sharing one hash
  are capped LOUDLY at ``max_hosts_per_hash`` (a fingerprint shared by
  10^4 hosts would emit 10^8 pairs; that is boilerplate, not mirroring,
  and the operator refuses rather than exploding — raise the cap
  deliberately if a corpus really needs it);
- pair counts and host set sizes both reduce output-sized; sizes
  broadcast (host-cardinality, guarded) for the final Jaccard map.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from .paradedup import host_para_rows

__all__ = ["mirror_host_pairs", "MAX_HOSTS_PER_HASH", "MAX_HOST_BROADCAST"]

MAX_HOSTS_PER_HASH = 256
MAX_HOST_BROADCAST = 1_000_000  # loud bound on the host-size broadcast


def mirror_host_pairs(
    docs: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    host_col: str = "source",
    num_parts: int = 16,
    max_hosts_per_hash: int = MAX_HOSTS_PER_HASH,
    max_host_broadcast: int = MAX_HOST_BROADCAST,
) -> "ray.data.Dataset":
    """(host_a, host_b, inter, jaccard) for every host pair sharing at
    least one paragraph fingerprint; ``jaccard`` = |A∩B| / |A∪B| over
    distinct-fingerprint sets, rounded to 6 (one terminal division of
    exact ints)."""
    from ray.data.aggregate import Sum

    def emit(batch: pa.Table) -> pa.Table:
        return host_para_rows(
            batch, text_col, id_col, host_col, num_parts, with_plen=False
        )

    def pairs_and_sizes(part: pa.Table) -> pa.Table:
        h = part.column("h").to_numpy(zero_copy_only=False)
        host = np.asarray(part.column("host").to_pandas(), dtype=object)
        labels, hc = np.unique(host, return_inverse=True)
        # host_b == '' is the row-kind sentinel separating size rows from
        # pair rows below; an empty-string host label would corrupt both
        # silently, so refuse it loudly (np.unique sorts '' first).
        if labels.size and labels[0] == "":
            raise ValueError(
                "mirror_host_pairs: empty-string host label collides with "
                "the size-row sentinel — clean or drop unlabeled docs "
                "upstream."
            )
        # distinct (h, host) via composite sort
        order = np.lexsort((hc, h))
        h, hc = h[order], hc[order]
        keep = np.r_[True, (h[1:] != h[:-1]) | (hc[1:] != hc[:-1])]
        h, hc = h[keep], hc[keep]
        # per-host distinct-fingerprint partials (each (h,host) is
        # unique within its one partition)
        s_hosts, s_counts = np.unique(hc, return_counts=True)
        out_a: list[str] = []
        out_b: list[str] = []
        # host pairs per shared hash
        starts = np.flatnonzero(np.r_[True, h[1:] != h[:-1]])
        ends = np.r_[starts[1:], h.size]
        for s, e in zip(starts, ends):
            m = e - s
            if m < 2:
                continue
            if m > max_hosts_per_hash:
                raise ValueError(
                    f"mirror_host_pairs: one fingerprint is shared by {m} "
                    f"hosts (> {max_hosts_per_hash}); that is boilerplate, "
                    "not mirroring — filter it upstream or raise "
                    "max_hosts_per_hash deliberately."
                )
            grp = sorted(labels[hc[s:e]])
            for i in range(m):
                for j in range(i + 1, m):
                    out_a.append(grp[i])
                    out_b.append(grp[j])
        return pa.table(
            {
                "host_a": pa.array(
                    out_a + [str(labels[i]) for i in s_hosts], pa.string()
                ),
                "host_b": pa.array(
                    out_b + [""] * len(s_hosts), pa.string()
                ),
                "inter": pa.array(
                    np.concatenate(
                        [np.ones(len(out_a), np.int64), s_counts.astype(np.int64)]
                    ),
                    pa.int64(),
                ),
            }
        )

    combined = (
        docs.map_batches(emit, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(pairs_and_sizes, batch_format="pyarrow")
        .groupby(["host_a", "host_b"])
        .aggregate(Sum("inter", alias_name="inter"))
        .materialize()
    )
    # host sizes: the host_b == "" rows — host-cardinality-bounded gather
    sizes_ds = combined.filter(expr="host_b == ''")
    n_hosts = sizes_ds.count()
    if n_hosts > max_host_broadcast:
        raise ValueError(
            f"mirror_host_pairs: {n_hosts} hosts exceed the size-broadcast "
            f"bound {max_host_broadcast}"
        )
    sizes = {
        r["host_a"]: int(r["inter"]) for r in sizes_ds.iter_rows()
    }
    sizes_ref = ray.put(sizes)

    def attach_jaccard(t: pa.Table) -> pa.Table:
        sz = ray.get(sizes_ref)
        a = t.column("host_a").to_pylist()
        b = t.column("host_b").to_pylist()
        inter = t.column("inter").to_numpy(zero_copy_only=False)
        keep = [x != "" for x in b]
        a = [x for x, k in zip(a, keep) if k]
        b = [x for x, k in zip(b, keep) if k]
        inter = inter[np.asarray(keep, dtype=bool)]
        jac = [
            round(int(i) / (sz[x] + sz[y] - int(i)), 6)
            for x, y, i in zip(a, b, inter)
        ]
        return pa.table(
            {
                "host_a": pa.array(a, pa.string()),
                "host_b": pa.array(b, pa.string()),
                "inter": pa.array(inter, pa.int64()),
                "jaccard": pa.array(jac, pa.float64()),
            }
        )

    return combined.map_batches(attach_jaccard, batch_format="pyarrow")
