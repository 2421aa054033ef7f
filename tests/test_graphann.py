"""Navigable-graph ANN (operators/graphann.py): exactness on the
skip-list arc fixture, recall on real embeddings, determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from echo_chambers_detection_spark.operators.graphann import (
    graph_ann_topk,
    hub_entries,
    skiplist_edges,
)
from echo_chambers_detection_spark.operators.planted import (
    planted_arc_embeddings,
)
from tests.conftest import SF_ORACLE


def _arc_queries(spark, m=8):
    return (
        spark.range(m)
        .select(
            F.col("id").alias("qid"),
            ((F.col("id") * F.lit(64) + F.lit(32.25)) * F.lit(0.005)).alias(
                "_qa"
            ),
        )
        .select("qid", F.array(F.cos("_qa"), F.sin("_qa")).alias("qvec"))
    )


def test_skiplist_beam_search_is_exact_on_arc(spark):
    """Unimodal distance along the chain + O(log n) skip reach => the
    walk finds the TRUE top-k; compare against brute force."""
    emb = planted_arc_embeddings(spark, 1, 512, delta=0.005, gap=0.0)
    queries = _arc_queries(spark)
    got = graph_ann_topk(
        skiplist_edges(spark, 512), emb, queries, k=5, beam=12
    )
    from echo_chambers_detection_spark.functions.vector import (
        cosine_similarity,
    )
    from pyspark.sql import Window

    w = Window.partitionBy("qid")
    brute = (
        queries.crossJoin(emb)
        .withColumn("sim", cosine_similarity("qvec", "vector"))
        .withColumn(
            "_rk",
            F.row_number().over(w.orderBy(F.desc("sim"), "node")),
        )
        .where(F.col("_rk") <= 5)
        .select("qid", "node", F.round("sim", 6).alias("sim"))
    )
    g = {(r["qid"], r["node"], r["sim"]) for r in got.collect()}
    b = {(r["qid"], r["node"], r["sim"]) for r in brute.collect()}
    assert g == b


def test_skiplist_edges_shape(spark):
    """Every node gets both directions of each in-range power-of-two
    chord; node 0 of n=16 has chords 1,2,4,8."""
    e = skiplist_edges(spark, 16)
    nbrs = {
        r["dst"]
        for r in e.where(F.col("src") == "000000").collect()
    }
    assert nbrs == {"000001", "000002", "000004", "000008"}
    # symmetric
    back = {
        r["src"] for r in e.where(F.col("dst") == "000000").collect()
    }
    assert back == nbrs


def test_hub_entry_recall_on_real_embeddings(spark):
    """The real-embedding face: k-NN graph + hub entries reaches >= 0.9
    recall@10 vs the exact GEMM top-k at beam 24."""
    from echo_chambers_detection_spark.catalog.vector import (
        _emb,
        _query_vec,
    )
    from echo_chambers_detection_spark.operators.hdbscan import knn_graph
    from echo_chambers_detection_spark.functions.vector import (
        cosine_similarity,
    )

    emb = _emb(spark, SF_ORACLE).select(
        F.col("post_cid").alias("node"), "vector"
    )
    queries = _query_vec(spark, SF_ORACLE).select(
        F.lit(0).alias("qid"), "qvec"
    )
    knn = knn_graph(emb, k=8).select("src", "dst")
    edges = knn.unionAll(
        knn.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    entries = hub_entries(emb, queries, n_hubs=64, per_query=4)
    got = {
        r["node"]
        for r in graph_ann_topk(
            edges, emb, queries, k=10, beam=24, hops=8, entries=entries
        ).collect()
    }
    exact = {
        r["node"]
        for r in queries.crossJoin(emb)
        .withColumn("sim", cosine_similarity("qvec", "vector"))
        .orderBy(F.desc("sim"), "node")
        .limit(10)
        .collect()
    }
    assert len(got & exact) >= 9, f"recall {len(got & exact)}/10"


def test_graph_ann_deterministic(spark):
    emb = planted_arc_embeddings(spark, 1, 128, delta=0.005, gap=0.0)
    queries = _arc_queries(spark, m=2)
    e = skiplist_edges(spark, 128)
    a = sorted(map(tuple, graph_ann_topk(e, emb, queries, k=3, beam=8).collect()))
    b = sorted(map(tuple, graph_ann_topk(e, emb, queries, k=3, beam=8).collect()))
    assert a == b
