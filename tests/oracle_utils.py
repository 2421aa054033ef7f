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


# DuckDB types whose pandas materialization diverges from what Spark
# produces for the "same" logical value.  SUM(BIGINT) in DuckDB returns
# HUGEINT (int128) which .df() renders as float64/object, while Spark's
# sum(bigint) stays bigint -> int64 — the driver's type-sensitive hash
# then goes red on value-identical results (VERDICT r8 "What's wrong" #1).
# Oracles must CAST such sums to BIGINT explicitly.
_FORBIDDEN_DUCKDB_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL", "INT128", "UINT128")


def _assert_oracle_types_hashable(con, sql: str, name: str):
    rel = con.sql(sql)
    for col, t in zip(rel.columns, rel.types):
        ts = str(t).upper()
        if any(f in ts for f in _FORBIDDEN_DUCKDB_TYPES):
            raise AssertionError(
                f"[{name}] oracle column '{col}' has DuckDB type {ts}, which "
                f"the driver's type-sensitive hash distinguishes from Spark's "
                f"output dtype. Wrap the expression in CAST(... AS BIGINT) "
                f"(or DOUBLE) in the oracle SQL."
            )


def _dtype_family(dt) -> str:
    if pd.api.types.is_bool_dtype(dt):
        return "bool"
    if pd.api.types.is_integer_dtype(dt):
        return "int"
    if pd.api.types.is_float_dtype(dt):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(dt):
        return "datetime"
    return "object"


def _assert_dtype_parity(got: pd.DataFrame, want: pd.DataFrame, name: str):
    """Driver-hash-faithful pre-canonicalization check: the Spark and the
    oracle pandas frames must agree on dtype *family* column-by-column
    (int vs float vs bool vs datetime vs object). The int64 coercion in
    _canonicalize happens AFTER this, so an uncast HUGEINT sum (arriving
    as float64/object) fails here instead of silently passing."""
    gmap = {c: got[c].dtype for c in got.columns}
    wmap = {c: want[c].dtype for c in want.columns}
    for c in sorted(set(gmap) & set(wmap)):
        gf, wf = _dtype_family(gmap[c]), _dtype_family(wmap[c])
        if gf != wf:
            # all-NULL columns legitimately arrive as object/float64 on
            # one side only; tolerate iff one side is entirely null
            if got[c].isna().all() or want[c].isna().all():
                continue
            raise AssertionError(
                f"[{name}] dtype-family mismatch on '{c}': "
                f"spark={gmap[c]} ({gf}) vs oracle={wmap[c]} ({wf}) — the "
                f"driver's hash is type-sensitive; align the types in the "
                f"query or the oracle SQL."
            )


def compare_with_oracle(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str = "?"):
    _assert_oracle_types_hashable(con, sql, name)
    got_raw = spark_df.toPandas()
    want_raw = con.execute(sql).df()
    _assert_dtype_parity(got_raw, want_raw, name)
    got = _canonicalize(got_raw)
    want = _canonicalize(want_raw)
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
