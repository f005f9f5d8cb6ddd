"""Aho–Corasick multi-pattern blocklist scoring — the C4/Gopher-style
"badwords filter" stage of a training-data pipeline: count occurrences
of every blocklist pattern in one pass per document, independent of the
pattern count (Aho & Corasick, CACM 1975 — public algorithm).

The automaton is the textbook goto/fail/output construction with one
optimization: ``total[v] = |out(v)| + total[fail(v)]`` is folded at
build time, so the scan adds a node's precomputed total instead of
walking fail chains per position. Matching is SUBSTRING, case-folded,
and counts EVERY occurrence; the shipped patterns are chosen
border-free (no proper prefix = suffix), which makes self-overlap
impossible and the count equal to SQL's non-overlapping
``(len(t) - len(replace(t, p, ''))) / len(p)`` — that identity is what
lets DuckDB gate the automaton exactly.

Scale shape: the automaton is built ONCE PER ACTOR in
``BlocklistScore.__init__`` (the actor-pool stateful-stage contract —
a production badwords list is 10^4+ patterns and the build is
pattern-mass-sized), then each batch is a pure streaming map; no
shuffle, no driver state. For tiny pattern sets a per-pattern
``str.count`` loop beats the Python-interpreted automaton walk —
``BlocklistScore`` picks the automaton past ``AC_CUTOVER`` patterns
(or when ``force_automaton`` is set — the oracle-gated query forces it
so DuckDB gates the automaton walk, not just the fallback) and the
tests pin both paths to identical counts.
"""

from __future__ import annotations

from collections import deque

import numpy as np
import pyarrow as pa

__all__ = ["AhoCorasick", "BlocklistScore", "AC_CUTOVER", "DEFAULT_PATTERNS"]

# border-free (non-self-overlapping) patterns over the corpus vocab —
# the property that makes occurrence counts equal on both engines
DEFAULT_PATTERNS = ("scan", "join", "slow", "dup", "hash key", "big table")

AC_CUTOVER = 32  # patterns; below this str.count is faster than the walk


class AhoCorasick:
    """goto/fail/output automaton over unicode code points."""

    def __init__(self, patterns: list[str]):
        if not patterns:
            raise ValueError("AhoCorasick needs at least one pattern")
        if len(set(patterns)) != len(patterns):
            raise ValueError("duplicate blocklist pattern")
        self.patterns = list(patterns)
        self.goto: list[dict[str, int]] = [{}]
        out_count = [0]
        for p in patterns:
            if not p:
                raise ValueError("empty blocklist pattern")
            v = 0
            for ch in p:
                nxt = self.goto[v].get(ch)
                if nxt is None:
                    self.goto.append({})
                    out_count.append(0)
                    nxt = len(self.goto) - 1
                    self.goto[v][ch] = nxt
                v = nxt
            out_count[v] += 1
        self.fail = [0] * len(self.goto)
        self.total = list(out_count)
        q = deque(self.goto[0].values())  # depth-1 nodes: fail = root
        while q:
            u = q.popleft()
            for ch, v in self.goto[u].items():
                q.append(v)
                # follow u's fail chain to the deepest state with a ch edge
                f = self.fail[u]
                while f and ch not in self.goto[f]:
                    f = self.fail[f]
                self.fail[v] = self.goto[f].get(ch, 0)
                self.total[v] += self.total[self.fail[v]]

    def count(self, text: str) -> int:
        """Total occurrences of all patterns in ``text`` (every match,
        all patterns, one pass)."""
        v = 0
        hits = 0
        goto = self.goto
        fail = self.fail
        total = self.total
        for ch in text:
            while v and ch not in goto[v]:
                v = fail[v]
            v = goto[v].get(ch, 0)
            if total[v]:
                hits += total[v]
        return hits


class BlocklistScore:
    """Actor-pool stage: (doc_id, text) -> (doc_id, n_hits, blocked).

    The automaton (or the small-list fallback) is built once per actor;
    ``__call__`` only scans batch text."""

    def __init__(
        self,
        patterns: tuple[str, ...] = DEFAULT_PATTERNS,
        id_col: str = "doc_id",
        text_col: str = "text",
        force_automaton: bool = False,
    ):
        self.patterns = [p.lower() for p in patterns]
        self.id_col = id_col
        self.text_col = text_col
        use_ac = force_automaton or len(self.patterns) > AC_CUTOVER
        self.ac = AhoCorasick(self.patterns) if use_ac else None

    def _count(self, text: str) -> int:
        low = text.lower()
        if self.ac is not None:
            return self.ac.count(low)
        return sum(low.count(p) for p in self.patterns)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        hits = np.array(
            [self._count(t or "") for t in texts], dtype=np.int64
        )
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "n_hits": pa.array(hits),
                "blocked": pa.array((hits > 0).astype(np.int64)),
            }
        )
