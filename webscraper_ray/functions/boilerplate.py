"""Host-level boilerplate paragraph detection (CCNet / C4-style:
Wenzek et al. 2020, arXiv:1911.00359; C4 — Raffel et al. 2020 — strips
lines repeated across a site). A paragraph that recurs across MANY
pages of the SAME host is navigation/footer chrome, not content — the
standard within-host boilerplate signal a crawl pipeline computes
before LLM-corpus curation.

Distinct from the corpus-wide keep-first dedup (:mod:`.paradedup`): the
grouping key is ``(host, paragraph)``, the decision is "seen in >=
``min_docs`` DISTINCT documents of that host", and the output annotates
every doc with how much of it is chrome rather than dropping spans.
The paragraph unit is the same 12-word window as :mod:`.paradedup`
(:func:`~webscraper_ray.functions.paradedup._doc_paragraphs` is reused
verbatim), so both operators stay exactly oracle-gateable over the
synthetic corpus. ``source`` stands in for the registered host — the
same host proxy the domain-mix and per-source operators use.

Scale shape:
- per-batch kernel ships (para_hash, host, doc_id, plen) — the 8-B
  paragraph hash plus the short dictionary-encoded host label, never
  paragraph text;
- ONE hash-partition exchange keyed by the paragraph hash (every row
  of a (host, para) group co-locates because para determines the
  partition); the partition resolves distinct-doc counts per
  (host, para) with sorted ``reduceat`` group math and reduces to
  per-doc partials before anything leaves;
- ONE doc-keyed exchange of 4-int partials — output-sized.

md5 collisions: the oracle applies the identical 64-bit paragraph hash
and groups by the raw host label exactly as this kernel does, so the
gate stays exact even when a collision merges two paragraph groups.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from .paradedup import host_para_rows

__all__ = ["boilerplate_stats", "MIN_DOCS"]

MIN_DOCS = 2  # a paragraph in >= this many distinct docs of a host is chrome


def boilerplate_stats(
    docs: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    host_col: str = "source",
    min_docs: int = MIN_DOCS,
    num_parts: int = 16,
) -> "ray.data.Dataset":
    """(doc_id, n_paras, n_boiler, boiler_chars) for every doc, where a
    paragraph is boilerplate iff its (host, hash) group spans >=
    ``min_docs`` distinct doc_ids. Every occurrence in a doc counts
    toward ``n_boiler`` (a nav block pasted twice is chrome twice)."""
    from ray.data.aggregate import Sum

    def emit(batch: pa.Table) -> pa.Table:
        return host_para_rows(
            batch, text_col, id_col, host_col, num_parts, with_plen=True
        )

    def host_group_reduce(part: pa.Table) -> pa.Table:
        h = part.column("h").to_numpy(zero_copy_only=False)
        d = part.column("doc_id").to_numpy(zero_copy_only=False)
        plen = part.column("plen").to_numpy(zero_copy_only=False)
        # factorize the host label partition-locally: groups only need
        # equal hosts to share a code (the joins._factorize discipline)
        host = np.asarray(part.column("host").to_pandas(), dtype=object)
        _, hc = np.unique(host, return_inverse=True)
        order = np.lexsort((d, hc, h))
        h, hc, d, plen = h[order], hc[order], d[order], plen[order]
        new_g = np.r_[True, (h[1:] != h[:-1]) | (hc[1:] != hc[:-1])]
        starts = np.flatnonzero(new_g)
        # distinct docs per (host, para) group: doc boundaries in-run
        new_doc = (np.r_[True, d[1:] != d[:-1]] | new_g).astype(np.int64)
        nd = np.add.reduceat(new_doc, starts)
        sizes = np.diff(np.r_[starts, h.size])
        boiler = np.repeat((nd >= min_docs).astype(np.int64), sizes)
        # per-doc partial BEFORE the doc-keyed exchange
        od = np.argsort(d, kind="stable")
        d, boiler, plen = d[od], boiler[od], plen[od]
        ds_ = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
        return pa.table(
            {
                "doc_id": pa.array(d[ds_]),
                "n_paras": pa.array(np.diff(np.r_[ds_, d.size])),
                "n_boiler": pa.array(np.add.reduceat(boiler, ds_)),
                "boiler_chars": pa.array(np.add.reduceat(boiler * plen, ds_)),
            }
        )

    return (
        docs.map_batches(emit, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(host_group_reduce, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(
            Sum("n_paras", alias_name="n_paras"),
            Sum("n_boiler", alias_name="n_boiler"),
            Sum("boiler_chars", alias_name="boiler_chars"),
        )
    )
