"""Property-based check of the triangle-family mirrors
(localgraph.tricount_local / transitivity_local / ktruss_local)
against pure-Python models on random small canonical edge lists —
the hypothesis-vs-model pattern of test_traversal_property. Because
triangle counts and the k-truss are GRAPH FACTS (unique answers),
the model is brute force: itertools triangles and naive iterated
support pruning. The Spark operators route through the mirrors at
this scale, so these also pin the operator outputs end to end."""

from __future__ import annotations

from itertools import combinations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

NODES = [f"t{i}" for i in range(9)]


@st.composite
def canon_edges(draw):
    pairs = draw(
        st.lists(
            st.tuples(st.sampled_from(NODES), st.sampled_from(NODES)),
            min_size=1,
            max_size=18,
        )
    )
    es = sorted({(min(u, v), max(u, v)) for u, v in pairs if u != v})
    if not es:
        es = [("t0", "t1")]
    return es


def _brute_triangles(edges):
    eset = set(edges)
    nodes = sorted({n for e in edges for n in e})
    return [
        (a, b, c)
        for a, b, c in combinations(nodes, 3)
        if (a, b) in eset and (a, c) in eset and (b, c) in eset
    ]


def model_tricounts(edges):
    deg: dict = {}
    for u, v in edges:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    t = {n: 0 for n in deg}
    for tri in _brute_triangles(edges):
        for n in tri:
            t[n] += 1
    return {
        (n, t[n], deg[n], deg[n] * (deg[n] - 1) // 2) for n in deg
    }


def model_ktruss(edges, k):
    cur = set(edges)
    while True:
        sup = {e: 0 for e in cur}
        for a, b, c in _brute_triangles(sorted(cur)):
            for e in ((a, b), (a, c), (b, c)):
                sup[e] += 1
        keep = {e for e in cur if sup[e] >= k - 2}
        if keep == cur:
            return {(u, v, sup[(u, v)]) for u, v in cur}
        cur = keep


@pytest.fixture(scope="module")
def _ops():
    from echo_chambers_detection_spark.operators.triangles import (
        ktruss_edges,
        transitivity_stats,
        triangle_counts,
    )

    return triangle_counts, transitivity_stats, ktruss_edges


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=canon_edges())
def test_triangle_counts_matches_brute_force(spark, _ops, edges):
    triangle_counts, _, _ = _ops
    df = spark.createDataFrame(edges, "u1 string, u2 string")
    got = {
        (r["node"], r["triangles"], r["deg"], r["wedges"])
        for r in triangle_counts(df).collect()
    }
    assert got == model_tricounts(edges)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=canon_edges())
def test_transitivity_matches_brute_force(spark, _ops, edges):
    _, transitivity_stats, _ = _ops
    df = spark.createDataFrame(edges, "u1 string, u2 string")
    row = transitivity_stats(df).first()
    deg: dict = {}
    for u, v in edges:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    assert row["n_nodes"] == len(deg)
    assert row["n_edges"] == len(edges)
    assert row["n_triangles"] == len(_brute_triangles(edges))
    assert row["n_wedges"] == sum(d * (d - 1) // 2 for d in deg.values())


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=canon_edges(), k=st.integers(3, 5))
def test_ktruss_matches_brute_force(spark, _ops, edges, k):
    _, _, ktruss_edges = _ops
    df = spark.createDataFrame(edges, "u1 string, u2 string")
    got = {
        (r["u1"], r["u2"], r["support"])
        for r in ktruss_edges(df, k=k).collect()
    }
    assert got == model_ktruss(edges, k)
