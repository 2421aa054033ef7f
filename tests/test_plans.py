"""Plan-property tests (SURVEY.md §4): pin the physical-plan facts that
make the headline queries scale — pushdown, pruning, broadcast choice,
top-k without global sort, and zero Python in JVM-only paths. A failure
here means a silent 10x regression at 100 TB, not a wrong answer."""

from __future__ import annotations

import pytest

from echo_chambers_detection_spark.catalog import QUERY_REGISTRY
from echo_chambers_detection_spark.plans.explain import (
    count_operator,
    has_python_stage,
    pushed_filters,
    read_schemas,
)
from tests.conftest import SF_ORACLE


def _q(spark, name):
    return QUERY_REGISTRY[name].spark(spark, SF_ORACLE)


def test_pricing_summary_filter_pushdown_and_pruning(spark):
    df = _q(spark, "pricing_summary")
    pf = " ".join(pushed_filters(df))
    assert "l_shipdate" in pf, f"shipdate filter not pushed: {pf}"
    schemas = read_schemas(df)
    assert schemas, "no parquet scan found"
    # only the 6 needed columns are read, not all 11
    assert "l_partkey" not in schemas[0]
    assert "l_quantity" in schemas[0]


def test_revenue_by_nation_broadcasts_dims(spark):
    df = _q(spark, "revenue_by_nation")
    assert count_operator(df, "BroadcastHashJoin") >= 2


def test_top_orders_uses_top_k_not_global_sort(spark):
    df = _q(spark, "top_orders")
    assert count_operator(df, "TakeOrderedAndProject") >= 1


def test_coengagement_projection_prunes_events_scan(spark):
    df = _q(spark, "coengagement_edges")
    schemas = read_schemas(df)
    # events has 6 columns; the projection needs user_id + props only
    assert all("event_type" not in s and "value" not in s for s in schemas)


def test_jvm_only_paths_have_no_python(spark):
    for name in (
        "coengagement_edges",
        "pricing_summary",
        "ann_topk",
        "user_mean_embeddings",
        "community_metrics_table",
        "minhash_lsh_candidates",
        "simhash_signatures",
        "text_quality_scores",
        "scd2_membership_history",
    ):
        df = _q(spark, name)
        assert not has_python_stage(df), f"{name} fell back to Python"


def test_ann_topk_is_top_k(spark):
    df = _q(spark, "ann_topk")
    assert count_operator(df, "TakeOrderedAndProject") >= 1


def test_semi_and_anti_joins_planned(spark):
    semi = _q(spark, "active_customers")
    anti = _q(spark, "customers_without_orders")
    assert count_operator(semi, "LeftSemi") >= 1
    assert count_operator(anti, "LeftAnti") >= 1
