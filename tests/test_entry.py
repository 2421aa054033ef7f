"""Smoke test for the driver contract (__spark_entry__)."""

from __future__ import annotations

import __spark_entry__ as entry_mod


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"u1", "u2", "weight", "handle"}
    first = rows[0]
    assert first.u1 < first.u2
    assert first.weight >= 1


def test_queries_and_oracles_aligned():
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert set(o).issubset(set(q))
    assert len(q) > 0
