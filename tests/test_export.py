"""Resumable partitioned export: marker semantics, resume skip, manifest."""

import os

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from webscraper_ray.functions.export import export_partitioned, finished_partitions


def _docs():
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(30), pa.int64()),
                "lang": pa.array([["en", "de", "fr"][i % 3] for i in range(30)]),
            }
        )
    )


def test_export_writes_markers_and_manifest(ray_session, tmp_path):
    out = str(tmp_path / "out")
    m = export_partitioned(_docs(), out, "lang").to_pydict()
    assert m["lang"] == ["de", "en", "fr"]
    assert m["n_rows"] == [10, 10, 10]
    assert m["skipped"] == [False, False, False]
    assert finished_partitions(out, "lang") == {"en", "de", "fr"}
    t = pq.read_table(os.path.join(out, "lang=de", "part-0.parquet"))
    assert t.num_rows == 10


def test_export_resume_skips_finished_partitions(ray_session, tmp_path):
    out = str(tmp_path / "out")
    export_partitioned(_docs(), out, "lang")
    # simulate a failed run: one partition lost its marker (crash before
    # certification) — resume must rewrite ONLY that partition
    os.remove(os.path.join(out, "lang=fr", "_SUCCESS"))
    before = {
        p: os.path.getmtime(os.path.join(out, f"lang={p}", "part-0.parquet"))
        for p in ("en", "de")
    }
    m = export_partitioned(_docs(), out, "lang").to_pandas().set_index("lang")
    assert bool(m.loc["fr", "skipped"]) is False  # rewritten
    assert bool(m.loc["en", "skipped"]) and bool(m.loc["de", "skipped"])
    assert list(m["n_rows"]) == [10, 10, 10]  # manifest complete on resume
    for p, mt in before.items():
        assert os.path.getmtime(
            os.path.join(out, f"lang={p}", "part-0.parquet")
        ) == mt, "finished partition was rewritten"


def test_export_all_finished_is_noop(ray_session, tmp_path):
    out = str(tmp_path / "out")
    export_partitioned(_docs(), out, "lang")
    m = export_partitioned(_docs(), out, "lang").to_pydict()
    assert m["skipped"] == [True, True, True]
    assert m["n_rows"] == [10, 10, 10]
