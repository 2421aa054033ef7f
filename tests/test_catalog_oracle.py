"""Oracle-differential test for every catalog query with an oracle
(mirrors the driver's CORRECTNESS gate at sf0.01)."""

from __future__ import annotations

import pytest

from echo_chambers_detection_spark.catalog import QUERY_REGISTRY
from tests.conftest import SF_ORACLE
from tests.oracle_utils import compare_with_oracle, duckdb_con

_WITH_ORACLE = sorted(n for n, s in QUERY_REGISTRY.items() if s.oracle)
_ROWS_ONLY = sorted(n for n, s in QUERY_REGISTRY.items() if not s.oracle)


@pytest.fixture(scope="module")
def con():
    c = duckdb_con(SF_ORACLE)
    yield c
    c.close()


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_query_matches_oracle(spark, con, name):
    spec = QUERY_REGISTRY[name]
    df = spec.spark(spark, SF_ORACLE)
    compare_with_oracle(df, con, spec.oracle, name=name)


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_query_runs(spark, name):
    spec = QUERY_REGISTRY[name]
    df = spec.spark(spark, SF_ORACLE)
    assert df.count() >= 0
