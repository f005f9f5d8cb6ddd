"""Aho–Corasick blocklist (functions/blocklist.py): automaton vs brute
force (incl. overlapping and nested patterns), the border-free
str.count identity the SQL gate relies on, cutover-path equality, and
the actor-stage contract."""

import random

import numpy as np
import pyarrow as pa
import pytest

from webscraper_ray.functions.blocklist import (
    AC_CUTOVER,
    AhoCorasick,
    BlocklistScore,
    DEFAULT_PATTERNS,
)


def _brute(pats, text):
    return sum(
        1
        for p in pats
        for i in range(len(text) - len(p) + 1)
        if text[i : i + len(p)] == p
    )


def test_counts_overlapping_and_nested():
    # "aa" self-overlaps; "a" nests in everything — AC must count all
    ac = AhoCorasick(["a", "aa", "aab"])
    text = "aaab"
    assert ac.count(text) == _brute(["a", "aa", "aab"], text)  # 3+2+1


def test_fuzz_vs_bruteforce():
    rng = random.Random(99)
    for _ in range(200):
        pats = list(
            {
                "".join(rng.choice("xyz") for _ in range(rng.randint(1, 4)))
                for _ in range(rng.randint(1, 7))
            }
        )
        text = "".join(rng.choice("xyz") for _ in range(rng.randint(0, 80)))
        assert AhoCorasick(pats).count(text) == _brute(pats, text)


def test_default_patterns_are_border_free():
    """The SQL replace-length identity requires no pattern to overlap
    itself: no proper prefix may equal a suffix."""
    for p in DEFAULT_PATTERNS:
        for k in range(1, len(p)):
            assert p[:k] != p[-k:], f"pattern {p!r} has border {p[:k]!r}"


def test_ac_equals_str_count_on_default_patterns():
    text = "scan the big table join dup dup hash key slow scandup" * 3
    ac = AhoCorasick(list(DEFAULT_PATTERNS))
    assert ac.count(text) == sum(text.count(p) for p in DEFAULT_PATTERNS)


def test_stage_both_paths_agree():
    texts = ["scan join dup", "", "big table hash key", "nothing here"]
    batch = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    small = BlocklistScore()  # str.count path (6 < AC_CUTOVER)
    assert small.ac is None
    padded = tuple(DEFAULT_PATTERNS) + tuple(
        f"zq{i}x" for i in range(AC_CUTOVER)
    )
    big = BlocklistScore(patterns=padded)  # automaton path
    assert big.ac is not None
    a = small(batch)
    b = big(batch)
    # the padding patterns never match, so counts must be identical
    assert a.column("n_hits").to_pylist() == b.column("n_hits").to_pylist()
    assert a.column("n_hits").to_pylist() == [3, 0, 2, 0]
    assert a.column("blocked").to_pylist() == [1, 0, 1, 0]


def test_case_folding():
    batch = pa.table(
        {
            "doc_id": pa.array([1], pa.int64()),
            "text": pa.array(["SCAN Join DUP"], pa.string()),
        }
    )
    out = BlocklistScore()(batch)
    assert out.column("n_hits").to_pylist() == [3]


def test_bad_patterns_raise():
    with pytest.raises(ValueError, match="empty"):
        AhoCorasick(["ok", ""])
    with pytest.raises(ValueError, match="duplicate"):
        AhoCorasick(["ab", "ab"])
    with pytest.raises(ValueError, match="at least one"):
        AhoCorasick([])
