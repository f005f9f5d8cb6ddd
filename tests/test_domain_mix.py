"""Domain mixing — quota math, hash-order selection, invariance."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from webscraper_ray.functions.dedup import md5_u64
from webscraper_ray.functions.sampling import domain_mix


def _corpus(spec):
    """spec: {source: n_docs}; doc ids globally unique."""
    ids, srcs = [], []
    nxt = 1
    for s, n in spec.items():
        for _ in range(n):
            ids.append(nxt)
            srcs.append(s)
            nxt += 1
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "source": pa.array(srcs, pa.string()),
            }
        )
    )


def test_exact_quota_and_hash_order(ray_session):
    ds = _corpus({"a": 10, "b": 10})
    out = (
        domain_mix(ds, id_col="doc_id", stratum_col="source",
                   weights={"a": 0.5, "b": 0.5})
        .to_pandas()
        .sort_values(["source", "doc_id"])
    )
    # scale = min(10/.5, 10/.5) = 20 -> kept 10 + 10 (everything)
    assert len(out) == 20
    out2 = domain_mix(
        _corpus({"a": 10, "b": 5}), id_col="doc_id", stratum_col="source",
        weights={"a": 0.5, "b": 0.5},
    ).to_pandas()
    # scale = min(20, 10) = 10 -> kept 5 per source
    assert out2.groupby("source").size().to_dict() == {"a": 5, "b": 5}
    # source a keeps the 5 ids with the SMALLEST md5_u64
    a_ids = sorted(out2[out2.source == "a"]["doc_id"])
    want = sorted(range(1, 11), key=lambda i: (md5_u64(str(i)), i))[:5]
    assert a_ids == sorted(want)


def test_unlisted_sources_dropped(ray_session):
    out = domain_mix(
        _corpus({"a": 4, "junk": 50}), id_col="doc_id", stratum_col="source",
        weights={"a": 1.0},
    ).to_pandas()
    assert set(out["source"]) == {"a"} and len(out) == 4


def test_missing_target_source_empties_mix(ray_session):
    # a target source absent from the corpus forces scale = 0
    out = domain_mix(
        _corpus({"a": 10}), id_col="doc_id", stratum_col="source",
        weights={"a": 0.5, "ghost": 0.5},
    )
    assert out.count() == 0


def test_parallelism_invariance(ray_session):
    ds = _corpus({"a": 30, "b": 20, "c": 10})
    w = {"a": 0.5, "b": 0.3, "c": 0.2}
    lo = (
        domain_mix(ds.repartition(1), id_col="doc_id", stratum_col="source", weights=w)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    hi = (
        domain_mix(ds.repartition(13), id_col="doc_id", stratum_col="source", weights=w)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert lo.equals(hi)
    # proportions exact: scale = min(60, 66.6, 50) = 50
    assert lo.groupby("source").size().to_dict() == {"a": 25, "b": 15, "c": 10}


def test_zero_weights_rejected(ray_session):
    with pytest.raises(ValueError):
        domain_mix(_corpus({"a": 1}), id_col="doc_id",
                   stratum_col="source", weights={})
