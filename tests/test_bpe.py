"""Units for distributed BPE training."""

import pyarrow as pa

import ray.data

from webscraper_ray.functions.bpe import _merge_row, bpe_train


def test_merge_row_left_to_right_nonoverlapping():
    # 'a a a' with pair (a,a): leftmost merge wins, third symbol stays
    assert _merge_row(["a", "a", "a"], "a", "a") == ["aa", "a"]
    assert _merge_row(["a", "b", "a", "b"], "a", "b") == ["ab", "ab"]
    assert _merge_row(["x", "a", "b"], "a", "b") == ["x", "ab"]
    assert _merge_row([], "a", "b") == []
    assert _merge_row(["a"], "a", "b") == ["a"]


def _hand_bpe(texts, n_merges):
    """Independent reference: textbook dict-based BPE on word counts."""
    from collections import Counter

    words = Counter()
    for t in texts:
        words.update(t.split())
    vocab = {w: list(w) for w in words}
    rules = []
    for r in range(1, n_merges + 1):
        pairs = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += words[w]
        if not pairs:
            break
        # (count DESC, pair ASC) tie-break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, rr), c = best
        rules.append((r, l, rr, c))
        vocab = {w: _merge_row(s, l, rr) for w, s in vocab.items()}
    return rules


def test_bpe_train_matches_reference_and_parallelism(ray_session):
    texts = [
        "merge merge merges stream stream",
        "the merge of streams and streams",
        "mergers stream the merge",
    ] * 5
    want = _hand_bpe(texts, 5)

    for blocks in (1, 7):
        ds = ray.data.from_arrow(
            pa.table({"text": pa.array(texts)})
        ).repartition(blocks)
        got = bpe_train(ds, n_merges=5).to_pylist()
        got_t = [(g["r"], g["left"], g["right"], g["pair_cnt"]) for g in got]
        assert got_t == want, f"blocks={blocks}"


def test_bpe_rejects_bar_tokens(ray_session):
    import pytest

    ds = ray.data.from_arrow(
        pa.table({"text": pa.array(["normal words here", "bad|token too"])})
    )
    with pytest.raises(Exception, match=r"\|"):
        bpe_train(ds, n_merges=1)
