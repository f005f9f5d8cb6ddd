"""Small-file compaction (q_compact_shards): the rewrite must actually
shrink the file count while preserving every row exactly (the oracle
gate covers values; this pins the layout claim)."""

import glob
import os
import tempfile

import pyarrow.parquet as pq

SF_DIR = "/root/testdata/sf0.001"


def _dirs(kind: str):
    root = os.path.join(tempfile.gettempdir(), f"webscraper_ray_{kind}")
    return [os.path.join(root, d) for d in os.listdir(root)]


def test_compaction_shrinks_files_and_keeps_rows(ray_session):
    from webscraper_ray.queries import QUERIES

    res = QUERIES["compact_shards"](SF_DIR)
    total = sum(r["n_events"] for r in res.take_all())
    n_src = pq.ParquetFile(os.path.join(SF_DIR, "events.parquet")).metadata.num_rows
    assert total == n_src

    # find THIS scale's compact dir by row count (caches for other
    # scales may coexist); every compact dir must be <= 8 files
    match = None
    for d in _dirs("compact"):
        files = glob.glob(os.path.join(d, "*.parquet"))
        assert len(files) <= 8
        rows = sum(pq.ParquetFile(p).metadata.num_rows for p in files)
        if rows == n_src:
            match = files
    assert match is not None and len(match) <= 8
    # the fragmented source for the same scale really was fragmented
    frag = [
        glob.glob(os.path.join(d, "*.parquet"))
        for d in _dirs("frag")
        if sum(
            pq.ParquetFile(p).metadata.num_rows
            for p in glob.glob(os.path.join(d, "*.parquet"))
        )
        == n_src
    ]
    assert frag and all(len(f) > 8 * len(match) for f in frag)
