"""Paragraph-level exact deduplication (C4 / Gopher-style boilerplate
removal: Raffel et al. 2020, arXiv:1910.10683 §2.2 dedupe "three-sentence
spans"; here the unit is a fixed word-window "paragraph" so the semantics
are exactly oracle-gateable over the synthetic corpus, which has no real
paragraph breaks).

Whole-doc dedup (`dedup.py`) drops documents; span stats (`dupspans.py`)
measure overlap; THIS operator performs the standard middle option —
remove repeated paragraphs corpus-wide, keeping the FIRST occurrence in
(doc_id, paragraph_index) order — and annotates every doc with how much
of it survives, the signal a curation pipeline thresholds on.

Scale shape (mirrors `dupspans.py`):
- per-batch kernel: split each doc into 12-word windows, ship the
  md5_u64 HASH of each paragraph (8 B) + an order key — never the text;
- exchange 1: hash-partition by paragraph hash; the winner of each hash
  group is its MINIMUM (doc_id, pid) composite key, resolved with one
  ``np.minimum.reduceat`` per partition; the partition reduces to
  per-doc partials (n_paras, n_kept, kept_chars) before leaving;
- exchange 2: doc-keyed, 3 ints per (doc, partition) — output-sized.

md5 collisions: the oracle applies the IDENTICAL 64-bit hash
(``('0x'||substr(md5(ptext),1,16))::UBIGINT``), so the gate stays exact
even when a collision merges two paragraph groups.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from .dedup import md5_u64
from .joins import _part_column

__all__ = ["paragraph_dedup_stats", "PARA_WORDS", "PID_LIMIT"]

PARA_WORDS = 12
# composite order key = doc_id * PID_LIMIT + pid must stay injective and
# inside int64; 4096 paragraphs/doc = ~49k words, far above the corpus max
PID_LIMIT = 4096


def _doc_paragraphs(batch: pa.Table, text_col: str, id_col: str):
    """(doc_id, pid, hash, plen) arrays for every 12-word paragraph.

    Split mirrors DuckDB ``string_split(text, ' ')`` (Python
    ``str.split(' ')`` — empty text yields ONE empty paragraph, not
    zero), so the SQL gate reproduces paragraph boundaries exactly.
    """
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    texts = batch.column(text_col).to_pylist()
    out_doc, out_pid, out_h, out_len = [], [], [], []
    for i, txt in zip(ids, texts):
        words = (txt or "").split(" ")
        n_p = (len(words) + PARA_WORDS - 1) // PARA_WORDS or 1
        if n_p > PID_LIMIT:
            raise ValueError(
                f"doc {int(i)} has {n_p} paragraphs >= PID_LIMIT={PID_LIMIT}"
            )
        for pid in range(n_p):
            ptext = " ".join(words[pid * PARA_WORDS : (pid + 1) * PARA_WORDS])
            out_doc.append(int(i))
            out_pid.append(pid)
            out_h.append(md5_u64(ptext))
            out_len.append(len(ptext))
    return (
        np.asarray(out_doc, np.int64),
        np.asarray(out_pid, np.int64),
        np.asarray(out_h, np.uint64),
        np.asarray(out_len, np.int64),
    )


def paragraph_dedup_stats(
    docs: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    num_parts: int = 16,
) -> "ray.data.Dataset":
    """(doc_id, n_paras, n_kept, kept_chars) for EVERY input doc under
    corpus-wide keep-first paragraph dedup."""
    from ray.data.aggregate import Sum

    def emit(batch: pa.Table) -> pa.Table:
        d, pid, h, plen = _doc_paragraphs(batch, text_col, id_col)
        hs = h.view(np.int64)  # bit-view: partition + sort domain only
        return pa.table(
            {
                "_part": _part_column(
                    pa.chunked_array([pa.array(hs)]), num_parts
                ),
                "h": pa.array(hs),
                "k": pa.array(d * PID_LIMIT + pid),
                "doc_id": pa.array(d),
                "plen": pa.array(plen),
            }
        )

    def keep_first_reduce(part: pa.Table) -> pa.Table:
        h = part.column("h").to_numpy(zero_copy_only=False)
        k = part.column("k").to_numpy(zero_copy_only=False)
        d = part.column("doc_id").to_numpy(zero_copy_only=False)
        plen = part.column("plen").to_numpy(zero_copy_only=False)
        order = np.argsort(h, kind="stable")
        h, k, d, plen = h[order], k[order], d[order], plen[order]
        starts = np.flatnonzero(np.r_[True, h[1:] != h[:-1]])
        sizes = np.diff(np.r_[starts, h.size])
        winners = np.repeat(np.minimum.reduceat(k, starts), sizes)
        kept = (k == winners).astype(np.int64)
        # per-doc partial BEFORE the doc-keyed exchange
        od = np.argsort(d, kind="stable")
        d, kept, plen = d[od], kept[od], plen[od]
        ds_ = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
        return pa.table(
            {
                "doc_id": pa.array(d[ds_]),
                "n_paras": pa.array(np.diff(np.r_[ds_, d.size])),
                "n_kept": pa.array(np.add.reduceat(kept, ds_)),
                "kept_chars": pa.array(np.add.reduceat(kept * plen, ds_)),
            }
        )

    return (
        docs.map_batches(emit, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(keep_first_reduce, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(
            Sum("n_paras", alias_name="n_paras"),
            Sum("n_kept", alias_name="n_kept"),
            Sum("kept_chars", alias_name="kept_chars"),
        )
    )


def host_para_rows(
    batch: pa.Table,
    text_col: str,
    id_col: str,
    host_col: str,
    num_parts: int,
    with_plen: bool,
) -> pa.Table:
    """Shared per-batch emit for the host-keyed paragraph operators
    (:mod:`.boilerplate`, :mod:`.mirrors`): one row per 12-word window —
    (_part = hash(para_hash), h, dict-encoded host[, plen]). One
    definition so the two operators can never drift on fingerprints,
    partitioning, or host attachment."""
    d, _pid, h, plen = _doc_paragraphs(batch, text_col, id_col)
    hosts = batch.column(host_col).to_pylist()
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    host_by_doc = {int(i): s for i, s in zip(ids, hosts)}
    hs = h.view(np.int64)  # bit-view: partition + sort domain only
    cols = {
        "_part": _part_column(pa.chunked_array([pa.array(hs)]), num_parts),
        "h": pa.array(hs),
        "host": pa.array(
            [host_by_doc[int(i)] for i in d], pa.string()
        ).dictionary_encode(),
    }
    if with_plen:
        cols["doc_id"] = pa.array(d)
        cols["plen"] = pa.array(plen)
    return pa.table(cols)
