"""Driver-contract checks: every SQL-backed query must match DuckDB
exactly (columns, rows, values) at sf0.001 — a local mirror of the
driver's CORRECTNESS gate."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


def _to_pandas(res):
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(6)
        elif np.issubdtype(df[c].dtype, np.datetime64):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _sql_backed():
    from webscraper_ray.queries import ORACLE_SQL

    return sorted(ORACLE_SQL)


@pytest.mark.parametrize("name", _sql_backed())
def test_query_matches_duckdb(name, ray_session, duck):
    from webscraper_ray.queries import ORACLE_SQL, QUERIES

    mine = _normalize(_to_pandas(QUERIES[name](SF)))
    want = _normalize(duck.execute(ORACLE_SQL[name]).df())
    assert list(mine.columns) == list(want.columns), f"{name}: column names"
    assert len(mine) == len(want), f"{name}: row count"
    pd.testing.assert_frame_equal(mine, want, check_dtype=False, atol=1e-9)


def test_rows_only_queries_run(ray_session):
    from webscraper_ray.queries import ORACLE_SQL, QUERIES

    for name in sorted(set(QUERIES) - set(ORACLE_SQL)):
        out = _to_pandas(QUERIES[name](SF))
        assert len(out) > 0, name


def test_entry_contract(ray_session):
    import __ray_entry__

    ds = __ray_entry__.entry()
    n = ds.count()
    assert n > 0
    names = set(ds.schema().names)
    assert {"id", "url", "title", "text", "content", "html", "ok"} <= names
    # every queries() key resolves; oracle_sql keys are a subset
    q, o = __ray_entry__.queries(), __ray_entry__.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 15


def test_regional_revenue_join_plan_matches_broadcast_plan(ray_session, duck):
    """The size-based planner's two physical plans (broadcast dict vs
    partitioned Dataset.join) must produce identical results; the join
    path is forced by setting the broadcast threshold to zero."""
    from webscraper_ray.queries import ORACLE_SQL, q_regional_revenue

    joined = _normalize(q_regional_revenue(SF, broadcast_max_rows=0).to_pandas())
    want = _normalize(duck.execute(ORACLE_SQL["regional_revenue"]).df())
    pd.testing.assert_frame_equal(joined, want, check_dtype=False, atol=1e-9)


def test_order_priority_join_plan_matches_broadcast_plan(ray_session, duck):
    from webscraper_ray.queries import ORACLE_SQL, q_order_priority

    joined = _normalize(q_order_priority(SF, broadcast_max_rows=0).to_pandas())
    want = _normalize(duck.execute(ORACLE_SQL["order_priority"]).df())
    pd.testing.assert_frame_equal(joined, want, check_dtype=False, atol=1e-9)


def test_top_revenue_join_plan_matches_broadcast_plan(ray_session, duck):
    from webscraper_ray.queries import ORACLE_SQL, q_top_revenue_orders

    joined = _normalize(q_top_revenue_orders(SF, broadcast_max_rows=0).to_pandas())
    want = _normalize(duck.execute(ORACLE_SQL["top_revenue_orders"]).df())
    pd.testing.assert_frame_equal(joined, want, check_dtype=False, atol=1e-9)


def test_returned_items_join_plan_matches_broadcast_plan(ray_session, duck):
    from webscraper_ray.queries import ORACLE_SQL, q_returned_items

    joined = _normalize(q_returned_items(SF, broadcast_max_rows=0).to_pandas())
    want = _normalize(duck.execute(ORACLE_SQL["returned_items"]).df())
    pd.testing.assert_frame_equal(joined, want, check_dtype=False, atol=1e-9)


def test_large_volume_join_plan_matches_broadcast_plan(ray_session, duck):
    from webscraper_ray.queries import ORACLE_SQL, q_large_volume_customers

    joined = _normalize(
        q_large_volume_customers(SF, broadcast_max_rows=0).to_pandas()
    )
    want = _normalize(duck.execute(ORACLE_SQL["large_volume_customers"]).df())
    pd.testing.assert_frame_equal(joined, want, check_dtype=False, atol=1e-9)


def test_promo_revenue_join_plan_matches_broadcast_plan(ray_session, duck):
    from webscraper_ray.queries import ORACLE_SQL, q_promo_revenue

    joined = _normalize(q_promo_revenue(SF, broadcast_max_rows=0).to_pandas())
    want = _normalize(duck.execute(ORACLE_SQL["promo_revenue"]).df())
    pd.testing.assert_frame_equal(joined, want, check_dtype=False, atol=1e-9)


def test_volume_shipping_join_plan_matches_broadcast_plan(ray_session, duck):
    from webscraper_ray.queries import ORACLE_SQL, q_volume_shipping

    joined = _normalize(q_volume_shipping(SF, broadcast_max_rows=0).to_pandas())
    want = _normalize(duck.execute(ORACLE_SQL["volume_shipping"]).df())
    pd.testing.assert_frame_equal(joined, want, check_dtype=False, atol=1e-9)


def test_market_share_join_plan_matches_broadcast_plan(ray_session, duck):
    from webscraper_ray.queries import ORACLE_SQL, q_market_share

    joined = _normalize(q_market_share(SF, broadcast_max_rows=0).to_pandas())
    want = _normalize(duck.execute(ORACLE_SQL["market_share"]).df())
    pd.testing.assert_frame_equal(joined, want, check_dtype=False, atol=1e-9)


def test_brand_qty_join_plan_matches_broadcast_plan(ray_session, duck):
    from webscraper_ray.queries import ORACLE_SQL, q_brand_qty_revenue

    joined = _normalize(q_brand_qty_revenue(SF, broadcast_max_rows=0).to_pandas())
    want = _normalize(duck.execute(ORACLE_SQL["brand_qty_revenue"]).df())
    pd.testing.assert_frame_equal(joined, want, check_dtype=False, atol=1e-9)


def test_read_sized_falls_through_on_large_files(monkeypatch):
    """Above a 64-block data-sized count, sized reads must pass NO
    override so large files keep Ray's own target-block-size scaling
    (the override would pin shuffle parallelism at 64 and balloon
    per-task memory at real volume)."""
    import webscraper_ray.queries as Q

    captured = {}

    def fake_read_parquet(path, **kwargs):
        captured.update(kwargs)
        return "ds"

    monkeypatch.setattr(Q.ray.data, "read_parquet", fake_read_parquet)
    sf = "/root/testdata/sf0.001"

    # small file: data-sized override applied, floor 8
    Q._read(sf, "documents", ["doc_id"], sized=True)
    assert captured.get("override_num_blocks") == 8

    # pretend the file is 1 GiB: no override at all
    captured.clear()
    monkeypatch.setattr(Q.os.path, "getsize", lambda p: 1 << 30)
    Q._read(sf, "documents", ["doc_id"], sized=True)
    assert "override_num_blocks" not in captured

    # unsized never overrides
    captured.clear()
    Q._read(sf, "documents", ["doc_id"])
    assert "override_num_blocks" not in captured
