"""Local replica of the driver's Spark-vs-DuckDB comparison: run a
queries() entry and its oracle_sql() on the same parquet tables, sort
columns by name + rows by value, compare exactly (floats to 9 decimal
places to absorb cross-engine printing, not ordering, differences).
"""

from __future__ import annotations

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(9)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype(str)
        else:
            try:
                df[c] = df[c].astype("int64")
            except (TypeError, ValueError):
                df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(spark_df, sql: str, sf_dir: str) -> None:
    got = normalize(spark_df.toPandas())
    con = duckdb_conn(sf_dir)
    want = normalize(con.execute(sql).fetchdf())
    con.close()
    assert list(got.columns) == list(want.columns), (
        f"columns differ: spark={list(got.columns)} oracle={list(want.columns)}"
    )
    assert len(got) == len(want), f"row counts differ: spark={len(got)} oracle={len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, rtol=0, atol=1e-9)
