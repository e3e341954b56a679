"""Mimic the driver's DuckDB-oracle comparison inside pytest.

Registers the driver parquet tables as DuckDB views, runs oracle SQL, and
compares against a Spark DataFrame order-insensitively (columns sorted by
name, rows sorted by all columns).
"""

from __future__ import annotations

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype("string")
    df = df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)
    return df


def assert_matches_oracle(spark_df, sql: str, sf_dir: str, float_tol: float = 1e-9):
    con = duck_con(sf_dir)
    expected = _normalize(con.sql(sql).df())
    got = _normalize(spark_df.toPandas())
    assert list(got.columns) == list(expected.columns), (
        f"columns differ: {list(got.columns)} vs {list(expected.columns)}"
    )
    assert len(got) == len(expected), f"row count {len(got)} != {len(expected)}"
    for c in got.columns:
        g, e = got[c], expected[c]
        if g.dtype.kind == "f" or e.dtype.kind == "f":
            pd.testing.assert_series_equal(
                g.astype(float), e.astype(float), check_names=False,
                rtol=float_tol, atol=float_tol,
            )
        else:
            pd.testing.assert_series_equal(
                g, e, check_names=False, check_dtype=False
            )
