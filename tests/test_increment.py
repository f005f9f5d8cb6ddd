"""Units for the incremental band-index near-dup probe."""

import os

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from webscraper_ray.functions.dedup import (
    N_HASHES,
    _band_hashes_u64,
    minhash_signatures_batch,
)
from webscraper_ray.functions.increment import (
    build_band_index,
    incremental_near_dups,
)


def _mk_docs(n, dup_every=7, seed=3):
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(50)]
    texts = []
    for i in range(n):
        if i % dup_every == 0 and i > 0:
            base = texts[i - dup_every]
            toks = base.split()
            # near-dup: perturb one token
            toks[rng.integers(0, len(toks))] = vocab[rng.integers(0, len(vocab))]
            texts.append(" ".join(toks))
        else:
            texts.append(" ".join(rng.choice(vocab, 30)))
    return texts


def _brute_incremental(ids, texts, new_mask, threshold=0.8):
    sigs, has = minhash_signatures_batch(texts)
    bands = {}
    for i, (doc, ok) in enumerate(zip(ids, has)):
        if not ok or new_mask[i]:
            continue
        for b, bh in enumerate(_band_hashes_u64(sigs[i])):
            bands.setdefault((b, bh), []).append(i)
    out = set()
    for i, (doc, ok) in enumerate(zip(ids, has)):
        if not ok or not new_mask[i]:
            continue
        cands = set()
        for b, bh in enumerate(_band_hashes_u64(sigs[i])):
            cands.update(bands.get((b, bh), ()))
        for j in cands:
            est = float((sigs[i] == sigs[j]).mean())
            if est >= threshold:
                out.add((ids[j], ids[i], round(est, 9)))
    return sorted(out)


def test_incremental_matches_bruteforce(ray_session, tmp_path):
    n = 120
    ids = list(range(n))
    texts = _mk_docs(n)
    new_mask = [i % 10 == 0 for i in ids]
    tbl = pa.table(
        {"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)}
    )
    old = ray.data.from_arrow(tbl.filter(pa.array([not m for m in new_mask])))
    new = ray.data.from_arrow(tbl.filter(pa.array(new_mask)))
    idx = str(tmp_path / "bandidx")
    build_band_index(old, idx)
    got = incremental_near_dups(new, idx).to_pandas()
    got_t = sorted(
        (int(a), int(b), round(float(e), 9))
        for a, b, e in zip(got["doc_old"], got["doc_new"], got["est_jaccard"])
    )
    assert got_t == _brute_incremental(ids, texts, new_mask)
    assert len(got_t) > 0  # the planted near-dups must actually collide


def test_incremental_probe_prunes_band_files(ray_session, tmp_path, monkeypatch):
    """A small increment must READ only the band-bucket dirs it hashes
    into — the same file-pruning pin as the ANN store."""
    import webscraper_ray.functions.increment as inc_mod

    n = 200
    ids = list(range(n))
    texts = _mk_docs(n, dup_every=5, seed=9)
    tbl = pa.table(
        {"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)}
    )
    old = ray.data.from_arrow(tbl.slice(1))  # all but doc 0
    new = ray.data.from_arrow(tbl.slice(0, 1))  # ONE new doc
    idx = str(tmp_path / "bandidx")
    build_band_index(old, idx, num_buckets=16)

    on_disk = {
        d for d in os.listdir(os.path.join(idx, "bands")) if d.startswith("bucket=")
    }
    assert len(on_disk) > 4  # the store is genuinely partitioned

    read_paths: list[str] = []
    real_read = ray.data.read_parquet

    def spy_read(paths, **kw):
        read_paths.extend(paths if isinstance(paths, list) else [paths])
        return real_read(paths, **kw)

    monkeypatch.setattr(inc_mod.ray.data, "read_parquet", spy_read)
    incremental_near_dups(new, idx).materialize()

    band_reads = {
        p.split("/bands/")[1].split("/")[0]
        for p in read_paths
        if "/bands/" in p
    }
    # one doc touches at most 16 band buckets; with 16 dirs the strict
    # check is that we never read MORE dirs than the doc's band count
    sigs, has = minhash_signatures_batch([texts[0]])
    want = {
        f"bucket={bh % 16}" for bh in _band_hashes_u64(sigs[0])
    } & on_disk
    assert band_reads == want
    assert band_reads < on_disk or len(want) == len(on_disk)


def test_incremental_nhash_mismatch_guard(ray_session, tmp_path):
    import json

    tbl = pa.table(
        {"doc_id": pa.array([1, 2], pa.int64()), "text": pa.array(["a b c d", "a b c d"])}
    )
    idx = str(tmp_path / "bandidx")
    build_band_index(ray.data.from_arrow(tbl), idx)
    meta = json.load(open(os.path.join(idx, "meta.json")))
    meta["n_hashes"] = N_HASHES * 2
    json.dump(meta, open(os.path.join(idx, "meta.json"), "w"))
    with pytest.raises(ValueError, match="n_hashes"):
        incremental_near_dups(ray.data.from_arrow(tbl), idx)


def test_incremental_empty_increment_returns_empty(ray_session, tmp_path):
    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["a b c d e", "f g h i j", "k l m n o"]),
        }
    )
    idx = str(tmp_path / "bandidx_e")
    build_band_index(ray.data.from_arrow(tbl), idx)
    # increment with only a too-short doc: no signatures, no band rows
    short = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([9], pa.int64()), "text": pa.array(["x y"])})
    )
    out = incremental_near_dups(short, idx)
    assert out.count() == 0
