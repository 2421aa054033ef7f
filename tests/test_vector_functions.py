"""Hand-computed checks for the native vector expressions (SURVEY.md F7-F9),
including the zero-vector guards the reference carries
(project/metrics/metrics_interface.py:53-55)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from echo_chambers_detection_spark.functions.vector import (
    cosine_similarity,
    dot,
    l2_norm,
    l2_normalize,
    squared_l2_distance,
)


def _df(spark, a, b):
    return spark.createDataFrame(
        [(a, b)], "a array<float>, b array<float>"
    )


def test_dot_and_norm(spark):
    row = (
        _df(spark, [1.0, 2.0, 3.0], [4.0, 5.0, 6.0])
        .select(
            dot("a", "b").alias("d"),
            l2_norm("a").alias("na"),
        )
        .first()
    )
    assert row.d == 32.0
    assert math.isclose(row.na, math.sqrt(14.0), rel_tol=1e-12)


def test_cosine_orthogonal_and_identical(spark):
    row = (
        _df(spark, [1.0, 0.0], [0.0, 1.0])
        .select(cosine_similarity("a", "b").alias("c"))
        .first()
    )
    assert row.c == 0.0
    row = (
        _df(spark, [2.0, 0.0], [4.0, 0.0])
        .select(cosine_similarity("a", "b").alias("c"))
        .first()
    )
    assert row.c == 1.0


def test_cosine_zero_vector_is_null(spark):
    row = (
        _df(spark, [0.0, 0.0], [1.0, 1.0])
        .select(cosine_similarity("a", "b").alias("c"))
        .first()
    )
    assert row.c is None


def test_l2_normalize_and_zero_guard(spark):
    row = (
        _df(spark, [3.0, 4.0], [0.0, 0.0])
        .select(
            l2_normalize("a").alias("na"),
            l2_normalize("b").alias("nb"),
        )
        .first()
    )
    assert [round(x, 9) for x in row.na] == [0.6, 0.8]
    assert row.nb == [0.0, 0.0]  # zero vector passes through


def test_squared_l2_distance(spark):
    row = (
        _df(spark, [1.0, 2.0], [4.0, 6.0])
        .select(squared_l2_distance("a", "b").alias("d"))
        .first()
    )
    assert row.d == 25.0


def test_vector_exprs_are_codegen_not_python(spark):
    """The whole point: no BatchEvalPython / PythonUDF in the plan."""
    df = _df(spark, [1.0, 0.0], [0.0, 1.0]).select(
        cosine_similarity("a", "b").alias("c")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan


# --- LSH ANN invariants (operators/ann.py scale path) ---------------------


def test_lsh_topk_finds_query_point_first(spark):
    """The query vector's own row has hamming 0 and cosine 1 — it must
    survive the prune and rank first."""
    from echo_chambers_detection_spark.catalog import QUERY_REGISTRY
    from tests.conftest import SF_ORACLE

    rows = QUERY_REGISTRY["ann_lsh_topk"].spark(spark, SF_ORACLE).collect()
    assert rows[0].post_cid == "0"
    assert rows[0].score == 1.0
    assert rows[0].hamming == 0


def test_lsh_near_dup_is_subset_of_exact(spark):
    """Banded LSH candidates rerank with the same threshold, so every
    reported pair must appear in the exact O(n²) result."""
    from echo_chambers_detection_spark.catalog import QUERY_REGISTRY
    from tests.conftest import SF_ORACLE

    approx = {
        (r.v1, r.v2)
        for r in QUERY_REGISTRY["embedding_lsh_near_dup"]
        .spark(spark, SF_ORACLE)
        .collect()
    }
    exact = {
        (r.v1, r.v2)
        for r in QUERY_REGISTRY["embedding_near_dup"]
        .spark(spark, SF_ORACLE)
        .collect()
    }
    assert approx <= exact


def test_int8_roundtrip_error_bound(spark):
    from pyspark.sql import functions as F

    from echo_chambers_detection_spark.functions.vector import (
        int8_dequantize,
        int8_quantize,
    )

    df = spark.createDataFrame(
        [
            ([0.5, -1.25, 3.0, 0.0],),
            ([0.0, 0.0, 0.0, 0.0],),  # zero vector: scale 1, codes 0
            ([-127.0, 127.0, 63.5, -0.001],),
        ],
        "v array<float>",
    )
    rows = df.select(
        "v",
        int8_quantize("v").alias("q"),
        int8_dequantize(int8_quantize("v")).alias("d"),
    ).collect()
    for r in rows:
        assert all(-127 <= c <= 127 for c in r.q.codes)
        half = r.q.scale / 2 + 1e-12
        for x, y in zip(r.v, r.d):
            assert abs(x - y) <= half, (x, y, r.q.scale)
    zero = [r for r in rows if all(x == 0.0 for x in r.v)][0]
    assert zero.q.scale == 1.0 and all(c == 0 for c in zero.q.codes)


def test_int8_topk_recall_vs_float(spark):
    """Quantized search quality: top-10 of the int8 path overlaps the
    float path heavily on the sf0.001 embeddings (exactness is covered
    by the catalog oracle; this pins the quality level)."""
    from echo_chambers_detection_spark.catalog import QUERY_REGISTRY

    sf = "/root/testdata/sf0.001"
    f = [r["post_cid"] for r in QUERY_REGISTRY["ann_topk"].spark(spark, sf).collect()]
    q = [
        r["post_cid"]
        for r in QUERY_REGISTRY["ann_int8_topk"].spark(spark, sf).collect()
    ]
    assert len(set(f) & set(q)) >= 8, (f, q)
