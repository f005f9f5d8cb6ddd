"""Inverted-index store — build/probe round-trip, file-level pruning."""

import os

import numpy as np
import pyarrow as pa

import ray.data

from webscraper_ray.functions.textindex import (
    build_text_index,
    term_postings,
    token_bucket,
)


def _docs(texts):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(1, len(texts) + 1), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )


def test_roundtrip_exact_postings(ray_session, tmp_path):
    idx = str(tmp_path / "tidx")
    build_text_index(_docs(["cat dog cat", "dog", "bird cat"]), idx, num_buckets=8)
    out = (
        term_postings(idx, ["cat", "dog"], num_buckets=8)
        .to_pandas()
        .sort_values(["token", "doc_id"])
        .reset_index(drop=True)
    )
    assert list(map(tuple, out.values)) == [
        ("cat", 1, 2),
        ("cat", 3, 1),
        ("dog", 1, 1),
        ("dog", 2, 1),
    ]


def test_probe_prunes_files(ray_session, tmp_path, monkeypatch):
    """The probe must read ONLY the bucket=K dirs its terms hash to."""
    import webscraper_ray.functions.textindex as ti_mod

    nb = 16
    vocab = [f"tok{i}" for i in range(40)]
    rng = np.random.default_rng(5)
    texts = [" ".join(rng.choice(vocab, size=12)) for _ in range(50)]
    idx = str(tmp_path / "tidx")
    build_text_index(_docs(texts), idx, num_buckets=nb)
    on_disk = {d for d in os.listdir(idx) if d.startswith("bucket=")}
    assert len(on_disk) > 2

    probe = ["tok3", "tok17"]
    want_buckets = set(token_bucket(np.array(probe), nb).tolist())

    read_paths = []
    real_read = ray.data.read_parquet

    def spy_read(paths, **kw):
        read_paths.append(list(paths) if isinstance(paths, list) else [paths])
        return real_read(paths, **kw)

    monkeypatch.setattr(ti_mod.ray.data, "read_parquet", spy_read)
    out = term_postings(idx, probe, num_buckets=nb).to_pandas()
    assert read_paths, "probe did not go through read_parquet"
    touched = {
        os.path.basename(os.path.dirname(p)) for ps in read_paths for p in ps
    }
    assert touched == {f"bucket={b}" for b in want_buckets}
    assert touched < on_disk  # strictly fewer dirs than the full index
    assert set(out["token"]) <= set(probe)


def test_missing_term_and_empty_probe(ray_session, tmp_path):
    idx = str(tmp_path / "tidx")
    build_text_index(_docs(["a b"]), idx, num_buckets=4)
    assert term_postings(idx, ["zzz"], num_buckets=4).count() == 0
    assert term_postings(idx, [], num_buckets=4).count() == 0


def test_phrase_search_counts_and_pruning(ray_session, tmp_path, monkeypatch):
    """Phrase adjacency counts against a hand-computed reference, plus
    the same file-pruning pin the term probe has."""
    import numpy as np

    import webscraper_ray.functions.textindex as ti

    docs = [
        (1, "big batch stream batch stream end"),  # 2 matches
        (2, "batch batch stream"),  # 1 match
        (3, "stream batch"),  # 0 (wrong order)
        (4, "batch alone here"),  # 0 (no second)
        (5, ""),  # empty doc
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in docs], pa.int64()),
                "text": pa.array([t for _, t in docs]),
            }
        )
    )
    idx = str(tmp_path / "posidx")
    ti.build_positional_index(ds, idx, num_buckets=16)

    read_paths: list[str] = []
    real_read = ti.ray.data.read_parquet

    def spy_read(paths, **kw):
        read_paths.extend(paths if isinstance(paths, list) else [paths])
        return real_read(paths, **kw)

    monkeypatch.setattr(ti.ray.data, "read_parquet", spy_read)
    got = ti.phrase_search(idx, "batch", "stream", num_buckets=16).to_pandas()
    assert dict(zip(got["doc_id"], got["n_matches"])) == {1: 2, 2: 1}

    want_buckets = set(
        ti.token_bucket(np.array(["batch", "stream"]), 16).tolist()
    )
    got_buckets = {
        int(p.split("bucket=")[1].split("/")[0]) for p in read_paths
    }
    on_disk = {
        int(d.split("=")[1])
        for d in os.listdir(idx)
        if d.startswith("bucket=")
    }
    assert got_buckets == (want_buckets & on_disk)
    assert got_buckets < on_disk  # genuinely pruned


def test_phrase_search_same_token(ray_session, tmp_path):
    import webscraper_ray.functions.textindex as ti

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": pa.array(["go go go stop", "stop go stop"]),
            }
        )
    )
    idx = str(tmp_path / "posidx2")
    ti.build_positional_index(ds, idx, num_buckets=8)
    got = ti.phrase_search(idx, "go", "go", num_buckets=8).to_pandas()
    # doc 1: positions 0,1,2 -> adjacents (0,1),(1,2) = 2; doc 2: none
    assert dict(zip(got["doc_id"], got["n_matches"])) == {1: 2}
