"""The local oracle harness must be driver-hash-faithful (VERDICT r8 #2).

The driver's value-hash is type-sensitive: a DuckDB oracle returning
HUGEINT (what SUM over any integer type yields) hashes differently from
Spark's bigint even when every value is identical.  These tests pin that
the local harness now rejects such oracles *before* the int64
canonicalization that used to hide them.
"""

from __future__ import annotations

import duckdb
import pytest

from tests.oracle_utils import compare_with_oracle


@pytest.fixture()
def con():
    c = duckdb.connect()
    c.execute("CREATE TABLE t AS SELECT * FROM (VALUES (1), (2), (3)) v(x)")
    yield c
    c.close()


def test_uncast_integer_sum_oracle_is_rejected(spark, con):
    sdf = spark.range(1).selectExpr("CAST(6 AS BIGINT) AS s")
    with pytest.raises(AssertionError, match="HUGEINT"):
        compare_with_oracle(sdf, con, "SELECT SUM(x) AS s FROM t", name="meta")


def test_cast_integer_sum_oracle_passes(spark, con):
    sdf = spark.range(1).selectExpr("CAST(6 AS BIGINT) AS s")
    compare_with_oracle(
        sdf, con, "SELECT CAST(SUM(x) AS BIGINT) AS s FROM t", name="meta"
    )


def test_decimal_oracle_is_rejected(spark, con):
    sdf = spark.range(1).selectExpr("CAST(2.0 AS DOUBLE) AS a")
    with pytest.raises(AssertionError, match="DECIMAL"):
        compare_with_oracle(
            sdf, con, "SELECT CAST(2.0 AS DECIMAL(10,2)) AS a", name="meta"
        )


def test_int_vs_float_dtype_family_mismatch_is_rejected(spark, con):
    # values compare equal elementwise (2 == 2.0) but the driver's hash
    # distinguishes int64 from float64 — the harness must too
    sdf = spark.range(1).selectExpr("CAST(2 AS BIGINT) AS a")
    with pytest.raises(AssertionError, match="dtype-family"):
        compare_with_oracle(
            sdf, con, "SELECT CAST(2.0 AS DOUBLE) AS a", name="meta"
        )
