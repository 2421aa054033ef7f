"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)    — flagship co-engagement query at sf0.001 (smoke check).
queries()       — name -> fn(spark, sf_dir) -> DataFrame, one per operator.
oracle_sql()    — name -> equivalent DuckDB SQL (omitted for non-SQL ops).

All real logic lives in the echo_chambers_detection_spark package; this
module just adapts the catalog to the driver's calling convention.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from echo_chambers_detection_spark.catalog import QUERY_REGISTRY
from echo_chambers_detection_spark.operators.coengagement import coengagement_edges
from echo_chambers_detection_spark.sources.domain import (
    engagements_from_events,
    users_from_events,
)
from echo_chambers_detection_spark.sources.tables import load_table

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: weighted co-engagement edges joined back to user attributes
    (SURVEY.md §7.3 M0 exit criterion)."""
    events = load_table(spark, "events", SMOKE_SF_DIR)
    edges = coengagement_edges(engagements_from_events(events))
    users = users_from_events(events)
    return (
        edges.join(users, edges.u1 == users.did)
        .select("u1", "u2", "weight", "handle")
        .orderBy("u1", "u2")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.spark for name, spec in QUERY_REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in QUERY_REGISTRY.items()
        if spec.oracle is not None
    }
