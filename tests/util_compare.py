"""Driver-style comparison: Ray pipeline result vs DuckDB oracle SQL.

Mimics the graft driver: row count + schema + order-insensitive value
comparison with columns sorted by name.
"""

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    import os

    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):  # fixture dirs may carry a subset of tables
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def assert_matches_oracle(ray_result, sql: str, sf_dir: str, check_dtype=False):
    con = duckdb_con(sf_dir)
    want = con.sql(sql).df()
    got = to_pandas(ray_result)
    assert sorted(got.columns) == sorted(want.columns), (
        f"columns differ: {sorted(got.columns)} vs {sorted(want.columns)}"
    )
    assert len(got) == len(want), f"row count {len(got)} != {len(want)}"
    g, w = canon(got), canon(want)
    pd.testing.assert_frame_equal(g, w, check_dtype=check_dtype, check_exact=False, rtol=1e-9)
