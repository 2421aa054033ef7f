"""DataSketches family (theta distinct, KLL quantiles) — regime tests.

The catalog pins the regimes: event_type_theta_users is oracle-backed
BECAUSE a theta sketch below nominal capacity is exact; this file
asserts (a) that exactness property where the oracle relies on it,
(b) the bounded error in the sampling regime the oracle can't see,
and (c) the KLL rank-error contract behind event_value_quantiles_kll.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_theta_exact_below_nominal_capacity(spark):
    # 12k distinct < 2^14 nominal: estimate must be EXACTLY the count
    df = spark.range(0, 60_000).select((F.col("id") % 12_000).alias("v"))
    est = df.agg(
        F.theta_sketch_estimate(F.theta_sketch_agg(F.col("v"), 14)).alias("e")
    ).first()["e"]
    assert est == 12_000


def test_theta_sampling_regime_error_bounded(spark):
    # 200k distinct >> 2^14: sampling kicks in; theta's RSE at k=16384
    # is ~1/sqrt(k) ~ 0.8%, so 4% is a generous deterministic-fixture bar
    n = 200_000
    df = spark.range(0, n).select(F.col("id").alias("v"))
    est = df.agg(
        F.theta_sketch_estimate(F.theta_sketch_agg(F.col("v"), 14)).alias("e")
    ).first()["e"]
    assert abs(est - n) / n < 0.04, est


def test_kll_rank_error_bounded(spark):
    # uniform 0..99999: true p50 = 49999.5-ish, p95 = 94999.05-ish.
    # KLL at default k=200 has ~1.7% rank error; assert 3% of the range.
    n = 100_000
    df = spark.range(0, n).select(F.col("id").cast("double").alias("v"))
    row = df.agg(
        F.kll_sketch_get_quantile_double(
            F.kll_sketch_agg_double("v"), F.lit(0.5)
        ).alias("p50"),
        F.kll_sketch_get_quantile_double(
            F.kll_sketch_agg_double("v"), F.lit(0.95)
        ).alias("p95"),
    ).first()
    assert abs(row["p50"] - 0.50 * n) / n < 0.03
    assert abs(row["p95"] - 0.95 * n) / n < 0.03


def test_kll_catalog_live_gap_small(spark):
    # the catalog query's self-reported rel_value_gap columns must stay
    # inside the same 3% bar on the real events table
    from echo_chambers_detection_spark.catalog import QUERY_REGISTRY

    rows = (
        QUERY_REGISTRY["event_value_quantiles_kll"]
        .spark(spark, "/root/testdata/sf0.001")
        .collect()
    )
    assert rows
    for r in rows:
        assert r["p50_rel_value_gap"] <= 0.03, r
        assert r["p95_rel_value_gap"] <= 0.03, r
        assert r["n"] > 0


def test_theta_set_ops_exact_below_capacity(spark):
    # two overlapping segments, both below 2^14: intersection and both
    # differences must be EXACT set counts (the property
    # event_type_theta_overlap's oracle relies on)
    a = spark.range(0, 8_000).select(F.col("id").alias("v"))
    b = spark.range(4_000, 10_000).select(F.col("id").alias("v"))
    ska = a.agg(F.theta_sketch_agg(F.col("v"), 14).alias("s"))
    skb = b.agg(F.theta_sketch_agg(F.col("v"), 14).alias("s2"))
    row = ska.crossJoin(skb).select(
        F.theta_sketch_estimate(
            F.theta_intersection(F.col("s"), F.col("s2"))
        ).alias("inter"),
        F.theta_sketch_estimate(
            F.theta_difference(F.col("s"), F.col("s2"))
        ).alias("only_a"),
        F.theta_sketch_estimate(
            F.theta_difference(F.col("s2"), F.col("s"))
        ).alias("only_b"),
    ).first()
    assert row["inter"] == 4_000
    assert row["only_a"] == 4_000
    assert row["only_b"] == 2_000


def test_theta_intersection_sampling_regime_error_bounded(spark):
    # 150k-vs-150k with a planted 100k overlap, both far above 2^14:
    # intersection error compounds both sketches' sampling, so allow a
    # wider (but still tight) 8% bar on this deterministic fixture
    a = spark.range(0, 150_000).select(F.col("id").alias("v"))
    b = spark.range(50_000, 200_000).select(F.col("id").alias("v"))
    ska = a.agg(F.theta_sketch_agg(F.col("v"), 14).alias("s"))
    skb = b.agg(F.theta_sketch_agg(F.col("v"), 14).alias("s2"))
    est = ska.crossJoin(skb).select(
        F.theta_sketch_estimate(
            F.theta_intersection(F.col("s"), F.col("s2"))
        ).alias("e")
    ).first()["e"]
    assert abs(est - 100_000) / 100_000 <= 0.08, est


def test_misra_gries_truncation_regime_bounds(spark):
    """MG(k=8) over a skewed 100k-row stream (one 60% heavy value,
    long rare tail): for every reported value est <= true <= est +
    max_err, the heavy value is reported, and the total error respects
    (k+1) * max_err <= n."""
    from pyspark.sql import functions as F

    from echo_chambers_detection_spark.operators.eventstats import (
        misra_gries_heavy_hitters,
    )

    n = 100_000
    df = spark.range(0, n, 1, 8).select(
        F.when(F.col("id") % 10 < 6, F.lit("hot"))
        .otherwise(F.concat(F.lit("t"), F.pmod(F.xxhash64("id"), 5000)))
        .alias("v")
    )
    true = {r["v"]: r["c"] for r in df.groupBy("v").agg(F.count("*").alias("c")).collect()}
    out = misra_gries_heavy_hitters(df, "v", k=8).collect()
    assert out, "no heavy hitters reported"
    max_err = out[0]["max_err"]
    assert all(r["max_err"] == max_err for r in out)
    assert (8 + 1) * max_err <= n
    reported = {r["value"]: r["est"] for r in out}
    assert "hot" in reported
    for v, est in reported.items():
        assert est <= true[v] <= est + max_err, (v, est, true[v], max_err)
    # exact regime: fewer distinct values than k -> exact counts, zero error
    small = spark.range(0, 1000, 1, 4).select(
        F.concat(F.lit("s"), F.pmod(F.col("id"), 5)).alias("v")
    )
    exact = misra_gries_heavy_hitters(small, "v", k=256).collect()
    assert all(r["max_err"] == 0 for r in exact)
    assert {r["value"]: r["est"] for r in exact} == {
        f"s{i}": 200 for i in range(5)
    }


def test_misra_gries_bounds_property(spark):
    """Property form of the MG guarantees over random streams: for
    EVERY reported value est <= true <= est + max_err, unreported
    values have true <= max_err, and (k+1) * max_err <= n — regardless
    of skew shape, duplicate structure, or partitioning."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from echo_chambers_detection_spark.operators.eventstats import (
        misra_gries_heavy_hitters,
    )

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[
            HealthCheck.too_slow,
            HealthCheck.function_scoped_fixture,
        ],
    )
    @given(
        st.lists(
            st.sampled_from([f"v{i}" for i in range(12)]),
            min_size=1,
            max_size=300,
        ),
        st.integers(2, 6),
        st.integers(1, 4),
    )
    def prop(values, k, parts):
        true = {}
        for v in values:
            true[v] = true.get(v, 0) + 1
        df = spark.createDataFrame(
            [(v,) for v in values], "v string"
        ).repartition(parts)
        out = misra_gries_heavy_hitters(df, "v", k=k).collect()
        n = len(values)
        if out:
            max_err = out[0]["max_err"]
            assert (k + 1) * max_err <= n
            reported = set()
            for r in out:
                assert r["max_err"] == max_err
                assert r["est"] <= true[r["value"]] <= r["est"] + max_err
                reported.add(r["value"])
            for v, c in true.items():
                if v not in reported:
                    assert c <= max_err, (v, c, max_err)

    prop()
