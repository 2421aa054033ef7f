"""Unit tests for the SCD-2 mutation path (expire + append) and catalog
helpers — the parts not covered by the window-function oracles
(reference project/db/postgres.py:38-47, community.py:51-59)."""

from __future__ import annotations

from pyspark.sql import functions as F

from echo_chambers_detection_spark.operators.scd2 import (
    ALGORITHM_NAMES,
    as_of,
    current_rows,
    expire_and_append,
    seed_algorithms,
)


def _membership(spark):
    return spark.createDataFrame(
        [
            ("c1", "n1", "2024-01-01 00:00:00", "2024-02-01 00:00:00"),
            ("c2", "n1", "2024-02-01 00:00:00", None),
            ("c1", "n2", "2024-01-01 00:00:00", None),
            ("c3", "n3", "2024-01-15 00:00:00", None),
        ],
        "community_id string, node_id string, valid_from string, valid_to string",
    ).select(
        "community_id",
        "node_id",
        F.col("valid_from").cast("timestamp").alias("valid_from"),
        F.col("valid_to").cast("timestamp").alias("valid_to"),
    )


def test_expire_and_append_run_boundary(spark):
    membership = _membership(spark)
    new = spark.createDataFrame(
        [("n1", "c9"), ("n2", "c9")], "node_id string, community_id string"
    )
    out = expire_and_append(membership, new, "2024-03-01 00:00:00")
    rows = out.collect()
    assert len(rows) == 6  # 4 old + 2 appended

    cur = {r["node_id"]: r["community_id"] for r in current_rows(out).collect()}
    # touched nodes move to c9; untouched n3 still current in c3
    assert cur == {"n1": "c9", "n2": "c9", "n3": "c3"}

    # expired rows closed exactly at the run boundary
    closed = out.where(
        (F.col("node_id") == "n1") & (F.col("community_id") == "c2")
    ).first()
    assert str(closed["valid_to"]) == "2024-03-01 00:00:00"

    # history for n1 has contiguous, non-overlapping intervals
    n1 = sorted(
        out.where(F.col("node_id") == "n1").collect(),
        key=lambda r: r["valid_from"],
    )
    for a, b in zip(n1, n1[1:]):
        assert a["valid_to"] == b["valid_from"]


def test_as_of_reads(spark):
    membership = _membership(spark)
    jan = {r["node_id"]: r["community_id"]
           for r in as_of(membership, "2024-01-20 00:00:00").collect()}
    assert jan == {"n1": "c1", "n2": "c1", "n3": "c3"}
    feb = {r["node_id"]: r["community_id"]
           for r in as_of(membership, "2024-02-10 00:00:00").collect()}
    assert feb["n1"] == "c2"
    # before any interval opened for n3
    early = as_of(membership, "2024-01-10 00:00:00")
    assert "n3" not in {r["node_id"] for r in early.collect()}


def test_seed_algorithms_on_conflict_do_nothing(spark):
    first = seed_algorithms(spark)
    assert {r["name"] for r in first.collect()} == set(ALGORITHM_NAMES)
    existing = spark.createDataFrame(
        [("louvain",), ("leiden",)], "name string"
    )
    second = seed_algorithms(spark, existing)
    names = {r["name"] for r in second.collect()}
    assert names == set(ALGORITHM_NAMES) - {"louvain", "leiden"}
    # ids deterministic across calls
    id1 = dict(first.select("name", "id").collect())
    id2 = dict(second.select("name", "id").collect())
    for n in names:
        assert id1[n] == id2[n]
