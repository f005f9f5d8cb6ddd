"""Driver-style correctness preflight: run registered Ray queries and
their DuckDB oracle SQL side by side at a small scale factor and
compare values (columns sorted by name, rows sorted by all columns,
dtype-insensitive — mirroring the driver's compare).

Usage:
    python tools/preflight.py [query ...]          # default: all
    GRAFT_SF_DIR=/root/testdata/sf0.01 python tools/preflight.py
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        df = res.to_pandas()
    elif isinstance(res, pa.Table):
        df = res.to_pandas()
    else:
        df = res
    return df


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main() -> int:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.01")
    names = sys.argv[1:]

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "16")),
            include_dashboard=False,
            logging_level="ERROR",
        )

    from webscraper_ray.queries import ORACLE_SQL, QUERIES

    if not names:
        names = list(QUERIES)

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    failures = 0
    for name in names:
        try:
            got = norm(to_pandas(QUERIES[name](sf_dir)))
            sql = ORACLE_SQL.get(name)
            if sql is None:
                print(f"{name:28s} rows={len(got)} (no oracle)")
                continue
            want = norm(con.execute(sql).fetchdf())
            ok_rows = len(got) == len(want)
            ok_cols = list(got.columns) == list(want.columns)
            ok_vals = False
            if ok_rows and ok_cols:
                try:
                    pd.testing.assert_frame_equal(
                        got, want, check_dtype=False, check_exact=False, rtol=1e-9
                    )
                    ok_vals = True
                except AssertionError as e:
                    ok_vals = False
                    err = str(e).splitlines()[0]
            status = "OK " if (ok_rows and ok_cols and ok_vals) else "FAIL"
            if status == "FAIL":
                failures += 1
                detail = f" cols ray={list(got.columns)} sql={list(want.columns)}" if not ok_cols else (
                    f" rows ray={len(got)} sql={len(want)}" if not ok_rows else f" values: {err}"
                )
            else:
                detail = ""
            print(f"{status} {name:28s} rows={len(got)}{detail}")
        except Exception as exc:  # noqa: BLE001 - report and continue
            failures += 1
            print(f"ERR  {name:28s} {type(exc).__name__}: {exc}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
