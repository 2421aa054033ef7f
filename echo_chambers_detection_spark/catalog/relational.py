"""Relational core over TPC-H-ish tables (SURVEY.md P*/J*/A*/T*/U*).

Split from the single-file catalog (round 7, VERDICT r6 #7); bodies
are verbatim from that file — see its git history for provenance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from echo_chambers_detection_spark.catalog._core import (
    _dec_sum,
    _t,
    register,
)

# ===========================================================================
# Relational core over TPC-H-ish tables (SURVEY.md P*/J*/A*/T*/U*)
# ===========================================================================


@register(
    "pricing_summary",
    """
SELECT
    l_returnflag,
    l_linestatus,
    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
    CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
    ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
    ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_disc,
    COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
    doc="TPC-H Q1-flavor aggregation; exercises filter pushdown + partial agg "
    "(SURVEY.md A1-A5 class)",
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") <= "1998-09-02")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        _dec_sum("l_quantity").alias("sum_qty"),
        _dec_sum("l_extendedprice").alias("sum_base_price"),
        _dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias(
            "sum_disc_price"
        ),
        F.round(_dec_sum("l_quantity") / F.count("*"), 6).alias("avg_qty"),
        F.round(_dec_sum("l_discount") / F.count("*"), 6).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


@register(
    "revenue_by_nation",
    """
SELECT
    n.n_name AS nation,
    CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
    COUNT(*) AS line_count
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
""",
    doc="3-way join + agg; nation/customer are broadcast-side "
    "(SURVEY.md J1/J2 class; broadcast decision is the scale point)",
)
def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            _dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias(
                "revenue"
            ),
            F.count("*").alias("line_count"),
        )
    )


@register(
    "regional_supplier_volume",
    """
SELECT n.n_name AS nation,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
       COUNT(*) AS line_count
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE r.r_name IN ('ASIA', 'EUROPE')
  AND o.o_orderdate >= TIMESTAMP '1996-01-01' AND o.o_orderdate < TIMESTAMP '1999-01-01'
GROUP BY n.n_name
""",
    doc="TPC-H Q5-shaped local-supplier-volume: a 5-way join chain where "
    "supplier and customer must share a nation (the classic co-location "
    "predicate), a region filter, and a date-range filter. Scale shape: "
    "lineitem-orders-customer carry the fact-side shuffles; supplier/"
    "nation/region are broadcast dimensions, so the co-nation equality "
    "is evaluated map-side and the region filter prunes before the agg; "
    "the decimal-exact revenue uses the same _dec_sum idiom as "
    "revenue_by_nation (SURVEY.md J1/J2/A-family).",
)
def q_regional_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        cust.join(orders, orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(
            F.broadcast(supp),
            (supp.s_suppkey == li.l_suppkey)
            & (supp.s_nationkey == cust.c_nationkey),
        )
        .join(F.broadcast(nation), nation.n_nationkey == cust.c_nationkey)
        .join(F.broadcast(region), region.r_regionkey == nation.n_regionkey)
        .where(
            F.col("r_name").isin("ASIA", "EUROPE")
            & (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            _dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias(
                "revenue"
            ),
            F.count("*").alias("line_count"),
        )
    )


@register(
    "top_orders",
    """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
""",
    doc="Global top-k (TakeOrderedAndProject — no full sort at scale; SURVEY.md T1-T3)",
)
def q_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(10)
    )


@register(
    "customers_without_orders",
    """
SELECT c.c_custkey, c.c_name
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
    doc="Anti-join (reference ON CONFLICT DO NOTHING seeding, SURVEY.md J8)",
)
def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "leftanti"
    ).select("c_custkey", "c_name")


@register(
    "active_customers",
    """
SELECT c.c_custkey, c.c_mktsegment
FROM customer c
WHERE EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_orderdate >= TIMESTAMP '1998-01-01'
)
""",
    doc="Semi-join filter (reference membership predicates, SURVEY.md P7/J7)",
)
def q_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").where(F.col("o_orderdate") >= "1998-01-01")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "leftsemi"
    ).select("c_custkey", "c_mktsegment")


@register(
    "top3_orders_per_customer",
    """
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM (
    SELECT o_custkey, o_orderkey, o_totalprice,
           ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey
           ) AS rn
    FROM orders
) t
WHERE rn <= 3
""",
    doc="Per-group top-n via ranking window (reference crawl limits, SURVEY.md T5/W-class)",
)
def q_top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        _t(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") <= 3)
    )


@register(
    "event_type_stats",
    """
SELECT event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY event_type
""",
    doc="Counts + distinct per group (reference global counts, SURVEY.md A2/A3)",
)
def q_event_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            _dec_sum("value").alias("total_value"),
        )
    )


@register(
    "user_running_totals",
    """
SELECT CAST(user_id AS VARCHAR) AS user_did,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1
""",
    doc="Per-user engagement totals — the batch fixpoint of the "
    "applyInPandasWithState running aggregate "
    "(streaming/stateful.py::running_user_counts; cross-micro-batch "
    "accumulation proven in tests/test_stateful_streaming.py). The "
    "stateful form is the engine-state version of the reference's "
    "read-modify-write consumer loop (consumer_user.py:25-56).",
)
def q_user_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "events")
        .groupBy(F.col("user_id").cast("string").alias("user_did"))
        .agg(
            F.count("*").alias("n_events"),
            _dec_sum("value").alias("total_value"),
        )
    )


@register(
    "user_first_seen",
    """
SELECT CAST(user_id AS VARCHAR) AS user_did,
       epoch_ms(MIN(ts)) AS first_ts_ms
FROM events
GROUP BY 1
""",
    doc="First-seen per key. The stateful operator "
    "(streaming/stateful.py::first_seen) reaches this as its fixpoint "
    "for IN-ORDER streams; with cross-batch out-of-order arrivals the "
    "operator keeps the first-batch minimum by design (emit-once "
    "append-mode dedup, reference MERGE-on-did idempotency "
    "consumer_user.py:33-41) while this batch query is the global MIN "
    "(ADVICE r2). Emit-once proven in tests/test_stateful_streaming.py; "
    "SURVEY.md U4/X3.",
)
def q_user_first_seen(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "events")
        .groupBy(F.col("user_id").cast("string").alias("user_did"))
        .agg(F.unix_millis(F.min("ts")).alias("first_ts_ms"))
    )


@register(
    "engagement_union",
    f"""
WITH liked AS (
    SELECT CAST(user_id AS VARCHAR) AS user_did,
           json_extract_string(props, '$.k') AS post_uri,
           'LIKED' AS kind
    FROM events WHERE event_type IN ('click', 'view')
), posted AS (
    SELECT CAST(user_id AS VARCHAR) AS user_did,
           json_extract_string(props, '$.k') AS post_uri,
           'POSTED' AS kind
    FROM events WHERE event_type = 'purchase'
)
SELECT user_did, post_uri, kind, COUNT(*) AS n
FROM (SELECT * FROM liked UNION ALL SELECT * FROM posted) u
WHERE post_uri IS NOT NULL
GROUP BY 1, 2, 3
""",
    doc="Union of edge kinds — the reference's [:LIKED|POSTED] alternation "
    "(SURVEY.md U1) plus MERGE-style dedup counting",
)
def q_engagement_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    base = ev.select(
        F.col("user_id").cast("string").alias("user_did"),
        F.get_json_object("props", "$.k").alias("post_uri"),
        "event_type",
    )
    liked = base.where(F.col("event_type").isin("click", "view")).withColumn(
        "kind", F.lit("LIKED")
    )
    posted = base.where(F.col("event_type") == "purchase").withColumn(
        "kind", F.lit("POSTED")
    )
    return (
        liked.unionByName(posted)
        .where(F.col("post_uri").isNotNull())
        .groupBy("user_did", "post_uri", "kind")
        .agg(F.count("*").alias("n"))
    )




@register(
    "order_value_quartiles",
    """
WITH q AS (
    SELECT o_orderpriority,
           o_totalprice,
           NTILE(4) OVER (PARTITION BY o_orderpriority
                          ORDER BY o_totalprice, o_orderkey) AS quartile
    FROM orders
)
SELECT o_orderpriority, quartile,
       COUNT(*) AS n,
       MIN(o_totalprice) AS min_price,
       MAX(o_totalprice) AS max_price
FROM q GROUP BY o_orderpriority, quartile
""",
    doc="NTILE quartile bucketing of order values per priority class "
    "(window-function surface: equal-frequency binning). The window "
    "order is made TOTAL with the o_orderkey tiebreak so tile "
    "assignment is deterministic; min/max are selections of stored "
    "doubles (no float arithmetic), so the oracle is hash-exact.",
)
def q_order_value_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    return (
        _t(spark, sf_dir, "orders")
        .select(
            "o_orderpriority",
            "o_totalprice",
            F.ntile(4).over(w).alias("quartile"),
        )
        .groupBy("o_orderpriority", "quartile")
        .agg(
            F.count("*").alias("n"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
    )


@register(
    "promo_revenue_share",
    """
SELECT
    CAST(SUM(CASE WHEN p.p_type = 'PROMO'
             THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))
             ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) AS promo_revenue,
    CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS total_revenue,
    COUNT(*) AS line_count
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01' AND l.l_shipdate < TIMESTAMP '1997-07-01'
""",
    doc="TPC-H Q14-shaped promo-revenue share: conditional decimal-"
    "exact aggregation over a date-sliced lineitem x part join — the "
    "first consumer of the part dimension (every other TPC-H-ish "
    "query keyed through orders/customer/supplier). Scale shape: the "
    "ship-date filter reaches the lineitem parquet scan, part is the "
    "broadcast dimension, and both sums run in the same single agg "
    "pass (the promo share is a CASE inside the sum, not a second "
    "scan). Both numerator and denominator are exact DECIMAL(18,6) "
    "sums cast to double at the end — the _dec_sum idiom — so the "
    "share a consumer derives is reproducible bit-for-bit.",
)
def q_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), part.p_partkey == li.l_partkey)
        .where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
        )
        .agg(
            F.sum(
                F.when(
                    F.col("p_type") == "PROMO", rev.cast("decimal(18,6)")
                ).otherwise(F.lit(0).cast("decimal(18,6)"))
            )
            .cast("double")
            .alias("promo_revenue"),
            _dec_sum(rev, 6).alias("total_revenue"),
            F.count("*").alias("line_count"),
        )
    )
