"""Local replica of the driver's DuckDB-oracle comparison.

The driver compares row-count + schema + order-insensitive value-hash at
sf0.01. We approximate that with an EXACT canonicalized-frame comparison:
sort columns by name, canonicalize dtypes, sort rows by all columns,
require exact equality. If a float differs even in the last ulp the test
fails — that is deliberate: the queries are designed so both engines
compute bit-identical doubles (exact decimal sums, deterministic division,
explicit rounding), and any drift is a query-design bug to fix, not a
tolerance to widen.
"""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd

TABLES = (
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
)


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def _canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        dt = df[c].dtype
        if pd.api.types.is_integer_dtype(dt):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(dt):
            df[c] = df[c].astype("float64")
        elif dt == object:
            # lists/arrays -> tuples so they sort/compare
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v
            )
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare_with_oracle(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str = "?"):
    got = _canonicalize(spark_df.toPandas())
    want = _canonicalize(con.execute(sql).df())
    assert list(got.columns) == list(want.columns), (
        f"[{name}] column mismatch: spark={list(got.columns)} oracle={list(want.columns)}"
    )
    assert len(got) == len(want), f"[{name}] row count: spark={len(got)} oracle={len(want)}"
    for c in got.columns:
        g, w = got[c].to_numpy(), want[c].to_numpy()
        if got[c].dtype == "float64":
            ok = (g == w) | (np.isnan(g.astype(float)) & np.isnan(w.astype(float)))
        else:
            ok = (g == w) | (pd.isna(got[c]).to_numpy() & pd.isna(want[c]).to_numpy())
        if not ok.all():
            bad = np.nonzero(~ok)[0][:5]
            detail = "; ".join(f"row {i}: spark={g[i]!r} oracle={w[i]!r}" for i in bad)
            raise AssertionError(f"[{name}] column '{c}' differs: {detail}")
