"""Distributed BPE tokenizer training — first K merge rules, exactly.

Training the tokenizer is part of the training-data pipeline itself
(Sennrich et al. 2016, ACL — public): byte-pair encoding repeatedly
merges the most frequent adjacent symbol pair. The classic scale insight
is that after ONE corpus pass that reduces the corpus to a weighted
word-count table, every merge round runs on the VOCABULARY, never the
corpus — and that is exactly the distributed shape here:

- pass 1 (the only corpus-sized work): per-batch word Counters ->
  one distinct-word-keyed exchange -> a materialized (word, cnt) vocab
  Dataset;
- per round: one vocab-sized ``map_batches`` computes weighted adjacent
  pair counts (Arrow list offsets + shifted numpy compare, no per-pair
  Python), one pair-keyed groupby sums them, the driver sees ONLY the
  argmax row (count DESC, pair ASC — deterministic tie-break), and a
  vocab-sized map applies the merge with the textbook left-to-right
  non-overlapping scan.

Determinism / oracle gating: counts are integers, the tie-break is
total, and the merge scan is position-deterministic, so the first K
rules are a pure function of the corpus. The SQL oracle replays the
rounds as chained CTEs (the k-means/pagerank trick) over a
boundary-safe string encoding: each word is rendered
``|c1|  |c2|  ...`` (bars around every symbol, two-space separators),
which makes plain left-to-right ``replace(sym, '|a|  |b|', '|ab|')``
EXACTLY the textbook merge — bars kill mid-symbol suffix matches and
the two-space separator is never shared between adjacent occurrences.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data
from ray.data.aggregate import Sum

__all__ = ["bpe_train"]


def _word_counts(
    ds: "ray.data.Dataset", text_col: str
) -> "ray.data.Dataset":
    """(word, cnt) — the one corpus pass. Reuses the suite's shared
    whitespace tokenizer so the SQL oracle splits identically."""
    from .tfidf import flat_tokens

    def partial(t: pa.Table) -> pa.Table:
        toks, _, _ = flat_tokens(t, text_col)
        words, counts = np.unique(np.asarray(toks, dtype=object), return_counts=True)
        return pa.table(
            {
                "word": pa.array(words, pa.string()),
                "cnt": pa.array(counts.astype(np.int64)),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("cnt", alias_name="cnt"))
    )


def _pair_counts(vocab: "ray.data.Dataset") -> "ray.data.Dataset":
    """Weighted adjacent-pair counts over the symbolized vocab —
    vectorized: flatten every row's symbol list once, compare shifted
    slices, weight by the row's word count."""

    def partial(t: pa.Table) -> pa.Table:
        syms = t.column("syms").combine_chunks()
        cnt = t.column("cnt").to_numpy(zero_copy_only=False)
        offsets = syms.offsets.to_numpy(zero_copy_only=False)
        flat = np.asarray(syms.flatten().to_pylist(), dtype=object)
        lens = np.diff(offsets)
        if flat.size < 2:
            return pa.table(
                {
                    "l": pa.array([], pa.string()),
                    "r": pa.array([], pa.string()),
                    "c": pa.array([], pa.int64()),
                }
            )
        # adjacency mask: positions whose successor is in the same list
        row_of = np.repeat(np.arange(len(lens)), lens)
        left = flat[:-1]
        right = flat[1:]
        same_row = row_of[:-1] == row_of[1:]
        w = cnt[row_of[:-1]][same_row]
        lw, rw = left[same_row], right[same_row]
        tab = pa.table(
            {
                "l": pa.array(lw, pa.string()),
                "r": pa.array(rw, pa.string()),
                "c": pa.array(w, pa.int64()),
            }
        )
        g = tab.group_by(["l", "r"]).aggregate([("c", "sum")])
        return g.rename_columns(["l", "r", "c"])

    return (
        vocab.map_batches(partial, batch_format="pyarrow")
        .groupby(["l", "r"])
        .aggregate(Sum("c", alias_name="c"))
    )


def _merge_row(symbols: list, left: str, right: str) -> list:
    """Textbook left-to-right non-overlapping merge scan."""
    out = []
    i, n = 0, len(symbols)
    while i < n:
        if i + 1 < n and symbols[i] == left and symbols[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return out


def bpe_train(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    n_merges: int = 6,
) -> pa.Table:
    """First ``n_merges`` BPE merge rules over the corpus; returns
    (r, left, right, pair_cnt) — one row per round, in round order."""

    def to_syms(t: pa.Table) -> pa.Table:
        words = t.column("word").to_pylist()
        for w in words:
            if "|" in w:
                # the SQL oracle's boundary-safe encoding reserves '|'
                # as the symbol delimiter; a bar INSIDE a token would
                # silently corrupt its trim/replace steps while the
                # Python scan handled it fine — fail loudly instead of
                # letting the two engines diverge (the exact_quantiles
                # guard discipline). Pre-strip bars upstream if needed.
                raise ValueError(
                    f"bpe_train: token {w!r} contains '|', which the "
                    "oracle encoding reserves; normalize the corpus first"
                )
        return pa.table(
            {
                "syms": pa.array(
                    [list(w) for w in words], pa.list_(pa.string())
                ),
                "cnt": t.column("cnt"),
            }
        )

    vocab = (
        _word_counts(ds, text_col)
        .map_batches(to_syms, batch_format="pyarrow")
        .materialize()
    )
    rules: list[tuple[int, str, str, int]] = []
    for r in range(1, n_merges + 1):
        pairs = _pair_counts(vocab)
        # the driver sees ONE row: argmax with the total tie-break
        top = pairs.sort(["c", "l", "r"], descending=[True, False, False]).limit(
            1
        ).take_all()
        if not top:
            break
        left, right, c = top[0]["l"], top[0]["r"], int(top[0]["c"])
        rules.append((r, left, right, c))

        def apply_merge(t: pa.Table, _l=left, _r=right) -> pa.Table:
            syms = t.column("syms").to_pylist()
            return pa.table(
                {
                    "syms": pa.array(
                        [_merge_row(s, _l, _r) for s in syms],
                        pa.list_(pa.string()),
                    ),
                    "cnt": t.column("cnt"),
                }
            )

        vocab = vocab.map_batches(apply_merge, batch_format="pyarrow").materialize()
    return pa.table(
        {
            "r": pa.array([x[0] for x in rules], pa.int64()),
            "left": pa.array([x[1] for x in rules], pa.string()),
            "right": pa.array([x[2] for x in rules], pa.string()),
            "pair_cnt": pa.array([x[3] for x in rules], pa.int64()),
        }
    )
