"""Property tests (hypothesis) for the round-4 kernels — pure functions
only, no Ray."""

from hypothesis import given, settings
from hypothesis import strategies as st

from webscraper_ray.functions.bpe import _merge_row
from webscraper_ray.functions.editdist import _neighborhood, edit_le1
from webscraper_ray.functions.graph import _unionfind_cc

_SHORT = st.text(alphabet="abc", max_size=6)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i in range(1, len(a) + 1):
        cur = [i] + [0] * len(b)
        for j in range(1, len(b) + 1):
            cur[j] = min(
                prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (a[i - 1] != b[j - 1])
            )
        prev = cur
    return prev[len(b)]


@given(_SHORT, _SHORT)
@settings(max_examples=300)
def test_edit_le1_equals_dp(a, b):
    assert edit_le1(a, b) == (_lev(a, b) <= 1)


@given(_SHORT, _SHORT)
@settings(max_examples=300)
def test_deletion_neighborhood_complete_for_distance_1(a, b):
    """The SymSpell completeness property the candidate stage relies on:
    distance <= 1 implies a shared key in {s} ∪ deletions1(s)."""
    if _lev(a, b) <= 1:
        assert _neighborhood(a) & _neighborhood(b)


@given(st.lists(st.sampled_from("ab"), max_size=12), st.sampled_from("ab"), st.sampled_from("ab"))
@settings(max_examples=300)
def test_merge_row_equals_bar_encoding_replace(syms, left, right):
    """The SQL oracle's |sym|/two-space replace() encoding must be the
    SAME merge the Python scan performs, for any symbol sequence."""
    got = _merge_row(syms, left, right)
    enc = "|" + "|  |".join(syms) + "|" if syms else ""
    enc = enc.replace(f"|{left}|  |{right}|", f"|{left}{right}|")
    want = [s for s in enc.strip("|").split("|  |")] if syms else []
    want = [w.strip("|") for w in want if w != ""]
    assert got == want


@given(
    st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)).filter(
            lambda p: p[0] != p[1]
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=200)
def test_unionfind_min_labels(pairs):
    import pyarrow as pa

    a = [min(p) for p in pairs]
    b = [max(p) for p in pairs]
    t = pa.table(
        {"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())}
    )
    got = _unionfind_cc([t], "a", "b")
    labels = dict(zip(got["node"].to_pylist(), got["label"].to_pylist()))
    # reference: BFS closure with min label
    adj: dict = {}
    for x, y in pairs:
        adj.setdefault(x, set()).add(y)
        adj.setdefault(y, set()).add(x)
    seen: set = set()
    for start in sorted(adj):
        if start in seen:
            continue
        comp, stack = set(), [start]
        while stack:
            n = stack.pop()
            if n in comp:
                continue
            comp.add(n)
            stack.extend(adj[n] - comp)
        seen |= comp
        root = min(comp)
        for n in comp:
            assert labels[n] == root


def test_fpe_tokenize_is_bijective(ray_session):
    """The 4-round Feistel must be a permutation of its 32-bit domain:
    distinct inputs -> distinct tokens, tokens stay in-domain."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from webscraper_ray.queries import q_fpe_tokenize  # noqa: F401
    from webscraper_ray.functions.dedup import md5_u64

    def feistel(v: int) -> int:
        hi, lo = v // 65536, v % 65536
        for r in range(4):
            hi, lo = lo, hi ^ (md5_u64(f"fpe:{r}:{lo}") % 65536)
        return hi * 65536 + lo

    vals = list(range(0, 3000, 7)) + [0, 65535, 65536, 2**32 - 1]
    toks = [feistel(v) for v in vals]
    assert len(set(toks)) == len(set(vals))
    assert all(0 <= t < 2**32 for t in toks)
    # tokens actually move (not the identity permutation)
    assert sum(1 for v, t in zip(vals, toks) if v == t) < len(vals) // 10


# --- round 5: shared one-pass signature kernel ------------------------------


@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                whitelist_categories=("Ll", "Lu", "Nd"), max_codepoint=0x7F
            )
            | st.sampled_from(" \t._-"),
            max_size=120,
        ),
        max_size=12,
    )
)
@settings(max_examples=60, deadline=None)
def test_combined_signature_matches_family_kernels(texts):
    """ensemble_near_dups' one-pass kernel must be bit-identical to the
    three family kernels it replaces — minhash sigs, sorted shingle
    hashes, simhash — for any input, including empty/short docs."""
    import numpy as np
    import pyarrow as pa

    from webscraper_ray.functions.dedup import (
        combined_signature_batch,
        minhash_signatures_batch,
        shingle_hash_table,
        simhash_batch,
    )

    sigs, has_sig, harr, sim = combined_signature_batch(texts)
    ref_sigs, ref_has = minhash_signatures_batch(texts)
    assert np.array_equal(sigs, ref_sigs)
    assert np.array_equal(has_sig, ref_has)
    assert np.array_equal(sim, simhash_batch(texts))
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    ref = shingle_hash_table(t)
    ref_map = dict(
        zip(ref.column("doc_id").to_pylist(), ref.column("hashes").to_pylist())
    )
    mine = {
        i: harr[i].tobytes() for i in range(len(texts)) if harr[i] is not None
    }
    assert mine == ref_map
