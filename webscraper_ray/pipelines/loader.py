"""Training-feed surface — the last mile of a training-data engine:
turn the curated corpus into a deterministic, epoch-shuffled stream of
fixed-context sequences a trainer can consume.

Composition of gated kernels (nothing new to verify, everything new to
USE): `functions.packing.pack_sequences` lays documents end-to-end into
``context_len`` sequences; `functions.ranking.global_hash_order` gives
each sequence an epoch-salted visit rank (same corpus + epoch -> same
order on ANY cluster shape — no seeded RNG, no resharding drift); the
stream is consumed via ``iter_batches`` (backpressured, never a driver
materialize) or written as rank-ordered shard files for a multi-host
trainer to map-read.

Scale notes: the one all-to-all here is the rank sort — inherent, the
trainer needs a total order; at 100 TB you write `epoch_shards` (one
file per rank block, resumable, trainers read their own slice) instead
of streaming through one driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..functions.packing import pack_sequences
from ..functions.ranking import global_hash_order

__all__ = ["epoch_sequences", "epoch_batches", "write_epoch_shards"]


def epoch_sequences(
    docs: "ray.data.Dataset",
    context_len: int = 2048,
    epoch: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "ray.data.Dataset":
    """(rank, seq_id, n_docs, n_tokens) — every packed sequence of the
    corpus in its epoch-``epoch`` visit order. Deterministic for a
    given (corpus, context_len, epoch)."""
    packed = pack_sequences(
        docs, context_len=context_len, id_col=id_col, text_col=text_col
    )

    def per_seq(part: pa.Table) -> pa.Table:
        seq = part.column("seq_id").to_numpy(zero_copy_only=False)
        tok = part.column("n_tokens").to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(seq, return_inverse=True)
        n_docs = np.bincount(inv, minlength=len(uniq))
        n_tok = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(n_tok, inv, tok)
        return pa.table(
            {
                "seq_id": pa.array(uniq.astype(np.int64)),
                "n_docs": pa.array(n_docs.astype(np.int64)),
                "n_tokens": pa.array(n_tok),
            }
        )

    # seq_id is the groupby key: one row per sequence after the reduce
    seqs = (
        packed.groupby("seq_id")
        .map_groups(per_seq, batch_format="pyarrow")
    )
    ranked = global_hash_order(
        seqs,
        id_col="seq_id",
        salt=f"epoch:{epoch}",
        carry_cols=["n_docs", "n_tokens"],
    )
    return ranked.map_batches(
        lambda t: t.rename_columns(["seq_id", "rank", "n_docs", "n_tokens"]),
        batch_format="pyarrow",
    ).sort("rank")


def epoch_batches(
    docs: "ray.data.Dataset",
    context_len: int = 2048,
    epoch: int = 0,
    batch_size: int = 8,
    **kw,
):
    """Yield the epoch's sequences as backpressured pyarrow batches of
    ``batch_size`` rows — what a single-host trainer loops over."""
    yield from epoch_sequences(
        docs, context_len=context_len, epoch=epoch, **kw
    ).iter_batches(batch_size=batch_size, batch_format="pyarrow")


def write_epoch_shards(
    docs: "ray.data.Dataset",
    out_dir: str,
    context_len: int = 2048,
    epoch: int = 0,
    **kw,
) -> str:
    """Write the epoch order as rank-ordered parquet shards (one file
    per block — resumable; a multi-host trainer maps shard ranges to
    hosts). Returns ``out_dir``."""
    epoch_sequences(docs, context_len=context_len, epoch=epoch, **kw).write_parquet(
        out_dir
    )
    return out_dir
