"""The dedup oracles must mirror the hot-bucket star caps: on a planted
corpus whose duplicate cluster EXCEEDS the cap, the DuckDB oracle and
the Ray engine must still agree exactly (found at sf0.1 in round 4: a
291-member simhash prefix bucket diverged from the then-uncapped SQL)."""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from webscraper_ray.functions.dedup import HOT_BAND_CAP
from webscraper_ray.queries import ORACLE_SQL, QUERIES


def _run_sql(sql: str, docs: pa.Table) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("documents", docs)
    return con.execute(sql).df()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


def _docs_table(texts):
    return pa.table(
        {
            "doc_id": pa.array(range(1, len(texts) + 1), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["eng"] * len(texts), pa.string()),
            "source": pa.array(["src0"] * len(texts), pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


@pytest.mark.parametrize("name", ["dedup_minhash", "dedup_simhash_near"])
def test_star_cap_mirrored_above_cap(ray_session, name, tmp_path, monkeypatch):
    # one duplicate cluster LARGER than the cap + a few unique docs
    m = HOT_BAND_CAP + 30
    dup = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    texts = [dup] * m + [
        f"unique words only here {i} nothing shared {i * 7}" for i in range(5)
    ]
    docs = _docs_table(texts)
    pq_path = tmp_path / "documents.parquet"
    import pyarrow.parquet as pq

    pq.write_table(docs, pq_path)

    # the Ray query reads documents.parquet from sf_dir
    got = QUERIES[name](str(tmp_path))
    got_df = _norm(got.to_pandas())
    want_df = _norm(_run_sql(ORACLE_SQL[name], docs))
    assert len(got_df) == len(want_df)
    # star shape: the cluster contributes m-1 pairs, all anchored at min id
    pd.testing.assert_frame_equal(
        got_df, want_df.astype(got_df.dtypes.to_dict()), check_exact=True
    )
    a = got_df["doc_a"] if "doc_a" in got_df else got_df[sorted(got_df.columns)[0]]
    assert (a[: m - 1] == 1).all()
