"""Bucketed co-located joins: the shuffle-elimination evidence SCALE.md
promises. Two tables bucketed by the same key into the same bucket
count join WITHOUT an Exchange on either side — at 100 TB that is the
difference between re-shuffling the fact table every query and reading
it pre-partitioned."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from echo_chambers_detection_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def bucketed_tables(spark):
    orders = load_table(spark, "orders", SF)
    cust = load_table(spark, "customer", SF)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    (
        orders.write.bucketBy(8, "o_custkey")
        .sortBy("o_custkey")
        .mode("overwrite")
        .saveAsTable("b_orders")
    )
    (
        cust.write.bucketBy(8, "c_custkey")
        .sortBy("c_custkey")
        .mode("overwrite")
        .saveAsTable("b_customer")
    )
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the sort-merge path: a broadcast join would hide the
        # bucketing evidence (and is the wrong plan once both sides are
        # fact-sized)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("b_orders").join(
            spark.table("b_customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:1500]
        # and the result is still the plain join's result
        plain = load_table(spark, "orders", SF).join(
            load_table(spark, "customer", SF),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        assert joined.count() == plain.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_aggregation_has_no_shuffle(spark, bucketed_tables):
    # a groupBy on the bucket key reuses the bucketing too
    agg = spark.table("b_orders").groupBy("o_custkey").agg(
        F.count("*").alias("n")
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:1500]
    assert agg.count() > 0
