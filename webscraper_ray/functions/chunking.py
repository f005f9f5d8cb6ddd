"""Document chunking — overlapping fixed-token windows.

The preprocessing staple between raw documents and packed training
sequences (and the retrieval-index unit): split each document into
``window``-token chunks every ``stride`` tokens (overlap = window −
stride). Pure per-batch flat map — chunking is a within-document
property, so the stage has no shuffle at any corpus size and its output
is trivially resumable (chunk ids are deterministic functions of the
input row). Whitespace tokenization matches the repo-wide oracle
contract ``string_split_regex(trim(text), '\\s+')``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["chunk_documents_batch", "chunk_documents"]


def chunk_documents_batch(
    batch: pa.Table,
    window: int = 64,
    stride: int = 48,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> pa.Table:
    """(doc_id, chunk_id, n_tokens, chunk_text) rows; a chunk starts at
    every stride multiple below the doc's token count, so every token is
    covered and the last chunk may be short."""
    if stride <= 0 or window <= 0:
        raise ValueError("chunk_documents: window and stride must be positive")
    if stride > window:
        raise ValueError(
            "chunk_documents: stride > window would leave uncovered token "
            "gaps (the coverage contract requires stride <= window)"
        )
    # tokenize with the SHARED oracle-contract kernel (RE2 \s+, not
    # Python str.split — see tfidf.flat_tokens)
    from .tfidf import flat_tokens

    tok_np, parent, _ = flat_tokens(batch, text_col)
    ids = batch.column(id_col).to_pylist()
    out_id: list[int] = []
    out_chunk: list[int] = []
    out_n: list[int] = []
    out_text: list[str] = []
    if tok_np.size:
        bounds = np.flatnonzero(np.r_[True, parent[1:] != parent[:-1]])
        ends = np.r_[bounds[1:], tok_np.size]
        for s, e in zip(bounds, ends):
            doc_id = ids[parent[s]]
            toks = tok_np[s:e]
            n = toks.size
            for k, start in enumerate(range(0, n, stride)):
                end = min(start + window, n)
                out_id.append(doc_id)
                out_chunk.append(k)
                out_n.append(end - start)
                out_text.append(" ".join(toks[start:end]))
    return pa.table(
        {
            id_col: pa.array(out_id, pa.int64()),
            "chunk_id": pa.array(out_chunk, pa.int64()),
            "n_tokens": pa.array(out_n, pa.int64()),
            "chunk_text": pa.array(out_text, pa.string()),
        }
    )


def chunk_documents(
    ds,
    window: int = 64,
    stride: int = 48,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    return ds.map_batches(
        chunk_documents_batch,
        fn_kwargs={
            "window": window,
            "stride": stride,
            "text_col": text_col,
            "id_col": id_col,
        },
        batch_format="pyarrow",
    )
