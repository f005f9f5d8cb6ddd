"""Text analysis operators: token counts, quality scoring, language-ID,
fingerprinting (task brief §text-analysis). All vectorized-per-batch
``map_batches`` transforms over the ``documents`` table; the only shuffles
are tiny aggregate outputs.
"""

from __future__ import annotations

import hashlib
import re

import pyarrow as pa

__all__ = [
    "token_stats",
    "repetition_stats",
    "benchmark_ngram_set",
    "contamination_check",
    "top_bigrams",
    "bigram_lm_coverage",
    "bpe_token_stats",
    "quality_scores",
    "quality_keep",
    "lang_id_ngram",
    "fingerprint_rolling",
    "normalize_text",
]

_WS = re.compile(r"\s+")
_PUNCT = re.compile(r"[.!?,;:]")
_MULTISPACE = re.compile(r" +")


def normalize_text(s: str) -> str:
    """CCNet-style normalization (Wenzek et al. 2020, arXiv:1911.00359
    §4.1): strip accents, lowercase, collapse runs of spaces — in that
    order, mirroring DuckDB's
    ``regexp_replace(lower(strip_accents(s)), ' +', ' ', 'g')`` so the
    oracle compares byte-identically. Accent stripping is NFD decompose
    + drop combining marks (utf8proc-equivalent on Latin input)."""
    import unicodedata

    d = unicodedata.normalize("NFD", s)
    stripped = "".join(c for c in d if not unicodedata.combining(c))
    return _MULTISPACE.sub(" ", stripped.lower())


def _sql_round(x: float, scale: int) -> float:
    """Round half away from zero (SQL ROUND semantics; Python's built-in
    round is half-even and diverges on exact .5s). ``scale`` is the
    power-of-ten multiplier (10_000 for 4 decimals, 1_000_000 for 6)."""
    import math

    return math.floor(abs(x) * scale + 0.5) / scale * (1 if x >= 0 else -1)


def _round4(x: float) -> float:
    return _sql_round(x, 10_000)
# tiny stopword lists per language for the n-gram/stopword heuristic
_STOPWORDS = {
    "eng": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for"},
    "spa": {"el", "la", "de", "que", "y", "en", "un", "es", "se", "no"},
    "deu": {"der", "die", "und", "das", "in", "von", "zu", "mit", "den", "ist"},
    "fra": {"le", "la", "de", "et", "les", "des", "en", "un", "du", "une"},
}


def token_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """(doc_id, n_tokens, n_chars_seen): whitespace tokenization, the same
    contract the oracle SQL expresses with string_split_regex."""
    texts = batch.column(text_col).to_pylist()
    n_tokens = [len(t.split()) if t and t.strip() else 0 for t in texts]
    n_chars = [len(t) if t else 0 for t in texts]
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_tokens": pa.array(n_tokens, pa.int64()),
            "n_chars_seen": pa.array(n_chars, pa.int64()),
        }
    )


def _round6(x: float) -> float:
    return _sql_round(x, 1_000_000)


def repetition_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """(doc_id, n_bigrams, top_bigram_count, top_bigram_frac): Gopher-style
    within-document repetition signal — the share of word 2-grams taken
    by the single most frequent 2-gram ("repetitious text" filters, Rae
    et al. 2021 §A1.1). Whitespace tokens, the same contract as
    :func:`token_stats`; docs with fewer than two tokens emit zeros.

    Per-batch map, no shuffle: repetition is a within-document property,
    so at any corpus size this stays embarrassingly parallel."""
    from collections import Counter

    texts = batch.column(text_col).to_pylist()
    n_bg, top_c, frac = [], [], []
    for t in texts:
        toks = t.split() if t and t.strip() else []
        if len(toks) < 2:
            n_bg.append(0)
            top_c.append(0)
            frac.append(0.0)
            continue
        top = max(Counter(zip(toks, toks[1:])).values())
        total = len(toks) - 1
        n_bg.append(total)
        top_c.append(top)
        frac.append(_round6(top / total))
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_bigrams": pa.array(n_bg, pa.int64()),
            "top_bigram_count": pa.array(top_c, pa.int64()),
            "top_bigram_frac": pa.array(frac, pa.float64()),
        }
    )


def benchmark_ngram_set(
    bench_ds, n: int = 3, text_col: str = "text"
) -> frozenset:
    """DISTINCT word n-grams of a benchmark Dataset, unioned driver-side.

    Decontamination's benchmark side is SMALL (eval suites are MBs even
    when the corpus is 100 TB), so gathering its distinct grams to the
    driver and broadcasting them once with ``ray.put`` is the right
    scale shape — the corpus side streams and never shuffles. At real
    scale, ship u64 hashes of the grams instead of strings to cut the
    broadcast payload ~10x."""

    def grams_of(batch: pa.Table) -> pa.Table:
        out: set[str] = set()
        for t in batch.column(text_col).to_pylist():
            toks = t.split() if t and t.strip() else []
            out.update(
                " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
            )
        return pa.table({"g": pa.array(sorted(out), pa.string())})

    parts = bench_ds.map_batches(grams_of, batch_format="pyarrow")
    return frozenset(
        v for b in parts.iter_batches(batch_format="pyarrow")
        for v in b.column("g").to_pylist()
    )


def contamination_check(
    ds, bench_ref, n: int = 3, text_col: str = "text"
):
    """Per-doc benchmark-overlap counts (GPT-3/Pile-style n-gram
    decontamination): how many DISTINCT word n-grams of the doc appear
    in the broadcast benchmark set, plus a contaminated flag.

    One ``map_batches`` over the corpus; the benchmark set is read from
    the object store once per task. Real decontamination uses 8-13-gram
    windows — ``n`` is a parameter; tests use 3 for signal on the small
    synthetic corpus."""
    import ray

    def check(batch: pa.Table) -> pa.Table:
        bench = ray.get(bench_ref)
        counts, flags = [], []
        for t in batch.column(text_col).to_pylist():
            toks = t.split() if t and t.strip() else []
            grams = {
                " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
            }
            c = sum(1 for g in grams if g in bench)
            counts.append(c)
            flags.append(c > 0)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_contaminated_ngrams": pa.array(counts, pa.int64()),
                "contaminated": pa.array(flags, pa.bool_()),
            }
        )

    return ds.map_batches(check, batch_format="pyarrow")


# GPT2-style pre-tokenizer, ASCII subset (the SQL contract runs the same
# pattern through DuckDB's RE2): contractions, space-prefixed letter runs,
# digit runs, punctuation runs.
_BPE_ISH = re.compile(r"'[sdmt]|'ll|'ve|'re| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+")


def bpe_token_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """(doc_id, n_tokens, n_bpe_tokens): whitespace count plus a BPE-ish
    pre-tokenizer count (task brief: token counting 'whitespace + a
    BPE-ish regex') — the second is what an LLM-ingest budget actually
    tracks; ratio of the two is a compressibility signal."""
    texts = [t or "" for t in batch.column(text_col).to_pylist()]
    ws = [len(t.split()) for t in texts]
    bpe = [len(_BPE_ISH.findall(t)) for t in texts]
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_tokens": pa.array(ws, pa.int64()),
            "n_bpe_tokens": pa.array(bpe, pa.int64()),
        }
    )


def quality_scores(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Deterministic quality components per doc:

    - n_tokens, mean_token_len (rounded 4)
    - punct_ratio: sentence-punctuation chars / chars (rounded 4)
    - upper_ratio: uppercase chars / chars (rounded 4)

    Chosen to be exactly reproducible in ANSI SQL for the oracle gate; a
    composite "keep" policy thresholds these downstream.
    """
    texts = [t or "" for t in batch.column(text_col).to_pylist()]
    n_tokens, mean_tok, punct, upper = [], [], [], []
    for t in texts:
        toks = t.split()
        n = len(toks)
        c = len(t)
        n_tokens.append(n)
        mean_tok.append(_round4(sum(map(len, toks)) / n) if n else 0.0)
        punct.append(_round4(len(_PUNCT.findall(t)) / c) if c else 0.0)
        # SQL oracle counts [A-Z]; mirror exactly (not unicode isupper)
        upper.append(_round4(sum("A" <= ch <= "Z" for ch in t) / c) if c else 0.0)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_tokens": pa.array(n_tokens, pa.int64()),
            "mean_token_len": pa.array(mean_tok, pa.float64()),
            "punct_ratio": pa.array(punct, pa.float64()),
            "upper_ratio": pa.array(upper, pa.float64()),
        }
    )


# composite keep-policy thresholds (the downstream filter the quality
# components exist for; Gopher-rule-style shape on the available signals)
KEEP_MIN_TOKENS = 20
KEEP_MEAN_TOKEN_LEN = (2.0, 12.0)
KEEP_MAX_PUNCT = 0.10
KEEP_MAX_UPPER = 0.30


def quality_keep_mask(batch: pa.Table, text_col: str = "text"):
    """Boolean keep mask for one batch (shared by the (doc_id, keep)
    projection and the in-place curation-pipeline filter)."""
    import pyarrow.compute as pc

    s = quality_scores(batch, text_col)
    return pc.and_(
        pc.and_(
            pc.greater_equal(s.column("n_tokens"), KEEP_MIN_TOKENS),
            pc.and_(
                pc.greater_equal(s.column("mean_token_len"), KEEP_MEAN_TOKEN_LEN[0]),
                pc.less_equal(s.column("mean_token_len"), KEEP_MEAN_TOKEN_LEN[1]),
            ),
        ),
        pc.and_(
            pc.less_equal(s.column("punct_ratio"), KEEP_MAX_PUNCT),
            pc.less_equal(s.column("upper_ratio"), KEEP_MAX_UPPER),
        ),
    )


def quality_keep(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """(doc_id, keep): the composite quality filter — keep iff the doc
    has enough tokens, a sane mean token length, and is not punctuation-
    or caps-dominated. Vectorized over the quality components."""
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "keep": quality_keep_mask(batch, text_col),
        }
    )


def token_freq_partial(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """(token, freq) pre-aggregated per batch — the combiner half of
    vocabulary building (tokenizer-training prep). The shuffle after
    this carries one row per DISTINCT token per block, never per token
    occurrence; whitespace tokenization is the same contract
    ``string_split_regex(trim(text), '\\s+')`` expresses in the oracle."""
    from collections import Counter

    counts: Counter = Counter()
    for t in batch.column(text_col).to_pylist():
        if t and t.strip():
            counts.update(t.split())
    return pa.table(
        {
            "token": pa.array(list(counts.keys()), pa.string()),
            "freq": pa.array(list(counts.values()), pa.int64()),
        }
    )


def vocab_top_tokens(
    ds, k: int = 200, text_col: str = "text"
):
    """Global top-k tokens by corpus frequency (ties: token ascending).

    Per-batch Counter partials -> groupby(token).sum (vocabulary-sized
    shuffle) -> per-block top-k prune -> final sort + limit over ≤ k×
    blocks rows."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    def block_topk(t: pa.Table) -> pa.Table:
        if t.num_rows <= k:
            return t
        idx = pc.sort_indices(
            t, sort_keys=[("freq", "descending"), ("token", "ascending")]
        )
        return t.take(idx[:k])

    return (
        ds.map_batches(token_freq_partial, fn_kwargs={"text_col": text_col},
                       batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("freq", alias_name="freq"))
        .map_batches(block_topk, batch_format="pyarrow")
        .sort(["freq", "token"], descending=[True, False])
        .limit(k)
    )


def bigram_freq_partial(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """(bigram, freq) pre-aggregated per batch — the combiner half of
    bigram-LM training. One row per DISTINCT bigram per block rides the
    shuffle, never per occurrence."""
    from collections import Counter

    counts: Counter = Counter()
    for t in batch.column(text_col).to_pylist():
        toks = t.split() if t and t.strip() else []
        counts.update(
            " ".join(p) for p in zip(toks, toks[1:])
        )
    return pa.table(
        {
            "bigram": pa.array(list(counts.keys()), pa.string()),
            "freq": pa.array(list(counts.values()), pa.int64()),
        }
    )


def top_bigrams(ds, k: int = 500, text_col: str = "text"):
    """Global top-k corpus bigrams by frequency (ties: bigram ascending)
    — the 'trained model' of a count-LM quality scorer. Same shape as
    :func:`vocab_top_tokens`: partials -> groupby.sum -> per-block
    prune -> k-sized final sort."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    def block_topk(t: pa.Table) -> pa.Table:
        if t.num_rows <= k:
            return t
        idx = pc.sort_indices(
            t, sort_keys=[("freq", "descending"), ("bigram", "ascending")]
        )
        return t.take(idx[:k])

    return (
        ds.map_batches(bigram_freq_partial, fn_kwargs={"text_col": text_col},
                       batch_format="pyarrow")
        .groupby("bigram")
        .aggregate(Sum("freq", alias_name="freq"))
        .map_batches(block_topk, batch_format="pyarrow")
        .sort(["freq", "bigram"], descending=[True, False])
        .limit(k)
    )


def bigram_lm_coverage(ds, lm_ref, text_col: str = "text"):
    """Count-LM quality score: the fraction of a doc's bigram
    OCCURRENCES that the broadcast top-K bigram set covers (a KenLM-ish
    fluency proxy kept integer-exact so the SQL oracle gates values,
    not approximations).

    Two-stage model-scoring shape: the 'model' is trained distributed
    (:func:`top_bigrams`), is bounded at K rows by construction — so the
    ``ray.put`` broadcast is safe at ANY corpus size — and scoring is
    one streaming map_batches."""
    import ray

    def score(batch: pa.Table) -> pa.Table:
        lm = ray.get(lm_ref)
        n_bg, n_in, cov = [], [], []
        for t in batch.column(text_col).to_pylist():
            toks = t.split() if t and t.strip() else []
            grams = [" ".join(p) for p in zip(toks, toks[1:])]
            n = len(grams)
            c = sum(1 for g in grams if g in lm)
            n_bg.append(n)
            n_in.append(c)
            cov.append(_round6(c / n) if n else 0.0)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_bigrams": pa.array(n_bg, pa.int64()),
                "n_in_lm": pa.array(n_in, pa.int64()),
                "lm_coverage": pa.array(cov, pa.float64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


def lang_id_ngram(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Stopword-vote language ID: argmax over per-language stopword hit
    counts (distinct-token intersection), 'und' (undetermined) when no
    stopword matches; ties break in table order (eng, spa, deu, fra).
    Deterministic and list-op-expressible, so the driver's DuckDB oracle
    gates it exactly."""
    texts = [t or "" for t in batch.column(text_col).to_pylist()]
    langs = []
    for t in texts:
        toks = set(t.lower().split())
        best, best_hits = "und", 0
        for code, words in _STOPWORDS.items():
            hits = len(toks & words)
            if hits > best_hits:
                best, best_hits = code, hits
        langs.append(best)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "pred_lang": pa.array(langs, pa.string()),
        }
    )


def fingerprint_rolling(batch: pa.Table, text_col: str = "text", window: int = 8) -> pa.Table:
    """Winnowing document fingerprint (Schleimer et al., SIGMOD'03 shape).

    Per doc: whitespace tokens of the lowercased text -> md5-u64 token
    hashes -> sliding-window (w=8) minima -> the fingerprint SET is the
    distinct window minima. Output: ``fingerprint`` = overall min hash as
    16 hex chars, ``n_fingerprints`` = |distinct window minima| (0 for
    empty docs). The hash is the big-endian first 8 md5 bytes == DuckDB
    ``('0x'||substr(md5(tok),1,16))::UBIGINT`` so the driver's SQL oracle
    reproduces both columns exactly; window minima are vectorized with
    ``sliding_window_view``.
    """
    import numpy as np

    texts = [t or "" for t in batch.column(text_col).to_pylist()]
    prints, counts = [], []
    for t in texts:
        toks = t.lower().split()
        if not toks:
            prints.append("0" * 16)
            counts.append(0)
            continue
        hs = np.array(
            [
                int.from_bytes(hashlib.md5(tok.encode("utf-8")).digest()[:8], "big")
                for tok in toks
            ],
            dtype=np.uint64,
        )
        if len(hs) <= window:
            wmins = hs.min(keepdims=True)
        else:
            wmins = np.lib.stride_tricks.sliding_window_view(hs, window).min(axis=1)
        prints.append(f"{int(wmins.min()):016x}")
        counts.append(int(np.unique(wmins).size))
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "fingerprint": pa.array(prints, pa.string()),
            "n_fingerprints": pa.array(counts, pa.int64()),
        }
    )


def _mg_summary(tokens, k: int):
    """Classic Misra-Gries with k counters over one token stream:
    survivors are every item whose in-stream frequency exceeds
    stream_len / (k + 1) (and possibly a few that don't)."""
    from collections import Counter

    counters: Counter = Counter()
    for tok in tokens:
        if tok in counters or len(counters) < k:
            counters[tok] += 1
        else:
            dead = [t for t in counters if counters[t] == 1]
            for t in counters:
                counters[t] -= 1
            for t in dead:
                del counters[t]
    return counters


def heavy_hitter_tokens(ds, k: int = 256, text_col: str = "text"):
    """ALL tokens with corpus frequency > N/k (N = total token count),
    EXACTLY — the streaming heavy-hitters operator (Misra-Gries 1982)
    with a two-pass exact refinement:

    pass 1: each block runs an independent k-counter Misra-Gries sketch
      and emits only its <= k survivors plus its token count. Pigeonhole
      makes the survivor UNION a guaranteed superset of every global
      heavy hitter: freq(x) > N/k forces freq_b(x) > N_b/k in at least
      one block b, and MG never evicts such an item there.
    pass 2: the candidate set (<= k x blocks tokens, ~KBs) broadcasts
      via ray.put and one streaming pass counts ONLY candidates
      exactly; the final filter keeps freq * k > N.

    The scale story vs `vocab_top_tokens`: the shuffle here is
    CANDIDATE-sized (k x blocks), not vocabulary-sized — on a 10^10-doc
    corpus with a 10^8-type vocabulary that is the difference between
    shuffling megabytes and shuffling the vocabulary."""
    import ray as _ray
    import ray.data as _rd
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    def mg_partial(t: pa.Table) -> pa.Table:
        toks = []
        for x in t.column(text_col).to_pylist():
            if x and x.strip():
                toks.extend(x.split())
        surv = _mg_summary(toks, k)
        return pa.table(
            {
                "token": pa.array(list(surv.keys()), pa.string()),
                "n_block": pa.array(
                    [len(toks)] + [0] * (len(surv) - 1) if surv else [],
                    pa.int64(),
                ),
            }
        )

    # candidate gather is k x blocks rows — bounded by the sketch size,
    # not the corpus (the same bounded-broadcast contract the LM/
    # contamination queries document)
    pass1 = ds.map_batches(mg_partial, batch_format="pyarrow").materialize()
    total = pass1.sum("n_block") or 0
    cands = set()
    for ref in pass1.to_arrow_refs():
        cands.update(_ray.get(ref).column("token").to_pylist())
    if not cands or total == 0:
        return _rd.from_arrow(
            pa.table(
                {"token": pa.array([], pa.string()),
                 "freq": pa.array([], pa.int64())}
            )
        )
    cand_ref = _ray.put(cands)

    def exact_counts(t: pa.Table) -> pa.Table:
        from collections import Counter

        wanted = _ray.get(cand_ref)
        counts: Counter = Counter()
        for x in t.column(text_col).to_pylist():
            if x and x.strip():
                counts.update(w for w in x.split() if w in wanted)
        return pa.table(
            {
                "token": pa.array(list(counts.keys()), pa.string()),
                "freq": pa.array(list(counts.values()), pa.int64()),
            }
        )

    def keep_heavy(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater(pc.multiply(t.column("freq"), k), total))

    return (
        ds.map_batches(exact_counts, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("freq", alias_name="freq"))
        .map_batches(keep_heavy, batch_format="pyarrow")
        .sort(["freq", "token"], descending=[True, False])
    )


def distinctive_terms(
    ds,
    k: int = 5,
    min_count: int = 20,
    num_parts: int = 16,
    lang_col: str = "lang",
    text_col: str = "text",
) -> pa.Table:
    """Distinctive vocabulary per language: top-``k`` tokens by LIFT —
    (within-group share) / (global share) — with a distributed
    ``min_count`` support floor. The group-contrast twin of
    :func:`vocab_top_tokens` (which ranks globally) and tf-idf (which
    contrasts per document): the shape that surfaces what a subcorpus
    talks about that the corpus at large does not.

    Scale shape: per-batch (lang, token) count partials -> ONE
    token-keyed hash exchange where the token's GLOBAL count is a
    partition-local group sum (a token lives in exactly one partition —
    never a vocabulary broadcast); lang totals are a |langs|-bounded
    side artifact; per-partition partial top-k per lang bounds the
    driver merge at k x |langs| x partitions rows. Lift is rounded
    half-away to 6 decimals BEFORE ranking on both sides (the bm25
    discipline); the division order mirrors the SQL's
    ``(tf_l * 1.0 / total_l) / (tf_g * 1.0 / total_g)`` exactly."""
    import numpy as np
    import pyarrow.compute as pc

    from .joins import _part_column
    from .tfidf import _round6_vec, flat_tokens

    def lang_tot_partial(t: pa.Table) -> pa.Table:
        toks, parent, _ = flat_tokens(t, text_col)
        if toks.size == 0:
            return pa.table(
                {"lang": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        langs = t.column(lang_col).to_numpy(zero_copy_only=False)[parent]
        u, c = np.unique(langs, return_counts=True)
        return pa.table(
            {"lang": pa.array(u, pa.string()), "n": pa.array(c.astype(np.int64))}
        )

    from ray.data.aggregate import Sum

    lang_rows = (
        ds.map_batches(lang_tot_partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    )
    total_l = {r["lang"]: int(r["n"]) for r in lang_rows}
    total_g = sum(total_l.values())

    def lt_partial(t: pa.Table) -> pa.Table:
        toks, parent, _ = flat_tokens(t, text_col)
        empty = pa.table(
            {
                "lang": pa.array([], pa.string()),
                "token": pa.array([], pa.string()),
                "tf_l": pa.array([], pa.int64()),
            }
        )
        if toks.size == 0:
            return empty
        langs = t.column(lang_col).to_numpy(zero_copy_only=False)[parent]
        g = (
            pa.table(
                {
                    "lang": pa.array(langs, pa.string()),
                    "token": pa.array(toks, pa.string()),
                    "tf_l": pa.array(np.ones(toks.size, np.int64)),
                }
            )
            .group_by(["lang", "token"])
            .aggregate([("tf_l", "sum")])
        )
        return g.rename_columns(["lang", "token", "tf_l"])

    def add_p(t: pa.Table) -> pa.Table:
        return t.append_column("_p", _part_column(t.column("token"), num_parts))

    def lift_topk(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "lang": pa.array([], pa.string()),
                "token": pa.array([], pa.string()),
                "tf_l": pa.array([], pa.int64()),
                "tf_g": pa.array([], pa.int64()),
                "lift": pa.array([], pa.float64()),
            }
        )
        if t.num_rows == 0:
            return empty
        g = (
            t.drop_columns(["_p"])
            .group_by(["lang", "token"])
            .aggregate([("tf_l", "sum")])
            .rename_columns(["lang", "token", "tf_l"])
        )
        # token's global count: partition-local (token -> one partition)
        tg = (
            g.select(["token", "tf_l"])
            .group_by("token")
            .aggregate([("tf_l", "sum")])
            .rename_columns(["token", "tf_g"])
        )
        idx = pc.index_in(g.column("token"), value_set=tg.column("token").combine_chunks())
        tf_g = tg.column("tf_g").combine_chunks().take(idx.combine_chunks())
        keep = pc.greater_equal(g.column("tf_l"), pa.scalar(min_count))
        g = g.append_column("tf_g", tf_g).filter(keep)
        if g.num_rows == 0:
            return empty
        tl = np.array(
            [total_l[x] for x in g.column("lang").to_pylist()], dtype=np.int64
        )
        tf_l = g.column("tf_l").to_numpy(zero_copy_only=False).astype(np.float64)
        tf_gn = g.column("tf_g").to_numpy(zero_copy_only=False).astype(np.float64)
        lift = _round6_vec(
            (tf_l * 1.0 / tl) / (tf_gn * 1.0 / float(total_g))
        )
        out = g.append_column("lift", pa.array(lift, pa.float64()))
        srt = pc.sort_indices(
            out,
            sort_keys=[
                ("lang", "ascending"),
                ("lift", "descending"),
                ("token", "ascending"),
            ],
        )
        out = out.take(srt)
        langs_s = out.column("lang").to_numpy(zero_copy_only=False)
        first = np.r_[True, langs_s[1:] != langs_s[:-1]]
        starts = np.flatnonzero(first)
        runlen = np.diff(np.r_[starts, langs_s.size])
        rank = np.arange(langs_s.size) - np.repeat(starts, runlen)
        return out.filter(pa.array(rank < k))

    parts = (
        ds.map_batches(lt_partial, batch_format="pyarrow")
        .map_batches(add_p, batch_format="pyarrow")
        .groupby("_p")
        .map_groups(lift_topk, batch_format="pyarrow")
        .take_all()
    )
    if not parts:
        return pa.table(
            {
                "lang": pa.array([], pa.string()),
                "token": pa.array([], pa.string()),
                "tf_l": pa.array([], pa.int64()),
                "tf_g": pa.array([], pa.int64()),
                "lift": pa.array([], pa.float64()),
            }
        )
    merged = pa.Table.from_pylist(parts)
    srt = pc.sort_indices(
        merged,
        sort_keys=[
            ("lang", "ascending"),
            ("lift", "descending"),
            ("token", "ascending"),
        ],
    )
    merged = merged.take(srt)
    langs_s = merged.column("lang").to_numpy(zero_copy_only=False)
    first = np.r_[True, langs_s[1:] != langs_s[:-1]]
    starts = np.flatnonzero(first)
    runlen = np.diff(np.r_[starts, langs_s.size])
    rank = np.arange(langs_s.size) - np.repeat(starts, runlen)
    final = merged.filter(pa.array(rank < k))
    srt2 = pc.sort_indices(
        final, sort_keys=[("lang", "ascending"), ("token", "ascending")]
    )
    return final.take(srt2).select(["lang", "token", "tf_l", "tf_g", "lift"])
