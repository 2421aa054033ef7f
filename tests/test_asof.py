"""asof_join semantics (SURVEY.md W2 superset; reference single-timestamp
as-of read at project/db/postgres.py:50-57): boundary ties, missing
history, left vs inner."""

from __future__ import annotations

from echo_chambers_detection_spark.operators.asof import asof_join


def _fixtures(spark):
    probes = spark.createDataFrame(
        [
            ("u1", 5, "e1"),    # before any version
            ("u1", 10, "e2"),   # exactly at v(10) -> sees "a"
            ("u1", 15, "e3"),   # between -> "a"
            ("u1", 20, "e4"),   # exactly at v(20) -> "b"
            ("u1", 99, "e5"),   # after last -> "b"
            ("u2", 50, "e6"),   # key with no versions at all
        ],
        "k string, ts long, id string",
    )
    versions = spark.createDataFrame(
        [("u1", 10, "a"), ("u1", 20, "b")],
        "k string, vts long, val string",
    )
    return probes, versions


def test_asof_inner(spark):
    probes, versions = _fixtures(spark)
    out = asof_join(
        probes, versions, key="k", probe_ts="ts", version_ts="vts",
        value_cols=["val"], how="inner",
    )
    got = {r["id"]: r["val"] for r in out.collect()}
    assert got == {"e2": "a", "e3": "a", "e4": "b", "e5": "b"}


def test_asof_left_keeps_unmatched(spark):
    probes, versions = _fixtures(spark)
    out = asof_join(
        probes, versions, key="k", probe_ts="ts", version_ts="vts",
        value_cols=["val"], how="left",
    )
    got = {r["id"]: r["val"] for r in out.collect()}
    assert got == {
        "e1": None, "e2": "a", "e3": "a", "e4": "b", "e5": "b", "e6": None,
    }


def test_asof_plan_has_no_range_join(spark):
    """The scale guarantee: one shuffle on the key, no broadcast
    nested-loop / cartesian from a range condition."""
    probes, versions = _fixtures(spark)
    out = asof_join(
        probes, versions, key="k", probe_ts="ts", version_ts="vts",
        value_cols=["val"],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_asof_null_valued_version_is_honored(spark):
    """A version row whose value is NULL must be matched (probe sees NULL),
    not skipped in favor of a stale older value — DuckDB ASOF JOIN matches
    on the timestamp inequality alone."""
    probes = spark.createDataFrame(
        [("u1", 15, "e1"), ("u1", 25, "e2")], "k string, ts long, id string"
    )
    versions = spark.createDataFrame(
        [("u1", 10, "a"), ("u1", 20, None)], "k string, vts long, val string"
    )
    out = asof_join(
        probes, versions, key="k", probe_ts="ts", version_ts="vts",
        value_cols=["val"], how="inner",
    )
    got = {r["id"]: r["val"] for r in out.collect()}
    # e2's latest version (vts=20) carries NULL — it must NOT fall back to "a",
    # and inner must still keep the row (the match exists).
    assert got == {"e1": "a", "e2": None}


def test_asof_multi_value_cols_never_mix_versions(spark):
    """With several value_cols, all fields must come from the SAME matched
    version, even when some of them are NULL in that version."""
    probes = spark.createDataFrame([("u1", 30, "e1")], "k string, ts long, id string")
    versions = spark.createDataFrame(
        [("u1", 10, "x1", 1), ("u1", 20, None, 2)],
        "k string, vts long, a string, b int",
    )
    out = asof_join(
        probes, versions, key="k", probe_ts="ts", version_ts="vts",
        value_cols=["a", "b"],
    )
    row = out.collect()[0]
    assert (row["a"], row["b"]) == (None, 2)  # both from vts=20, no mixing


def test_asof_rejects_column_collisions(spark):
    import pytest

    probes = spark.createDataFrame([("u1", 1, "z")], "k string, ts long, val string")
    versions = spark.createDataFrame([("u1", 1, "a")], "k string, vts long, val string")
    with pytest.raises(ValueError, match="collide"):
        asof_join(
            probes, versions, key="k", probe_ts="ts", version_ts="vts",
            value_cols=["val"],
        )
