"""Property-based check of the traversal family (bfs_distances /
bellman_ford_khop) against pure-Python models on random small graphs —
the same hypothesis-vs-model pattern as test_asof_property. Pins the
frontier loop's hop semantics (max_iter IS the k-hop bound) and the
min-plus relaxation against brute-force shortest paths, including
disconnected pieces and duplicate edges.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

NODES = [f"n{i}" for i in range(8)]


@st.composite
def graph(draw):
    edges = draw(
        st.lists(
            st.tuples(
                st.sampled_from(NODES),
                st.sampled_from(NODES),
                st.integers(1, 9),
            ),
            min_size=1,
            max_size=14,
        ).filter(lambda es: any(u != v for u, v, _ in es))
    )
    # the operators symmetrize and take (u1, u2) distinct; self-loops
    # are not produced by the co-engagement projection, drop them
    return [(u, v, w) for u, v, w in edges if u != v]


def _adj(edges):
    adj: dict = {}
    for u, v, w in edges:
        adj.setdefault(u, {})
        adj.setdefault(v, {})
        # duplicate (u,v) rows: _symmetrize ships every row, so weights
        # of duplicate edges both participate in relaxation; the min
        # weight wins for shortest paths
        adj[u][v] = min(adj[u].get(v, w), w)
        adj[v][u] = min(adj[v].get(u, w), w)
    return adj


def model_bfs(edges, seed, max_iter):
    adj = _adj(edges)
    dist = {seed: 0}
    frontier = [seed]
    for d in range(1, max_iter + 1):
        nxt = []
        for u in frontier:
            for v in adj.get(u, {}):
                if v not in dist:
                    dist[v] = d
                    nxt.append(v)
        frontier = nxt
    return dist


def model_khop_cost(edges, seed, k):
    # min cost over paths of <= k edges: Bellman-Ford, k rounds
    adj = _adj(edges)
    cost = {seed: 0}
    for _ in range(k):
        new = dict(cost)
        for u, c in cost.items():
            for v, w in adj.get(u, {}).items():
                if v not in new or c + w < new[v]:
                    new[v] = c + w
        if new == cost:
            break
        cost = new
    return cost


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
@given(graph(), st.integers(1, 4))
def test_traversal_matches_models(spark, edges, bound):
    """DISTRIBUTED loop vs the models (the local mirror is forced off;
    tiny graphs would otherwise always take it)."""
    import echo_chambers_detection_spark.operators.graph as G
    from echo_chambers_detection_spark.operators.graph import (
        bellman_ford_khop,
        bfs_distances,
    )

    df = spark.createDataFrame(edges, "u1 string, u2 string, weight long")
    seed = min({u for u, _, _ in edges} | {v for _, v, _ in edges})

    saved = G.LOCAL_TRAVERSAL_EDGE_LIMIT
    G.LOCAL_TRAVERSAL_EDGE_LIMIT = 0
    try:
        got_bfs = {
            r["node"]: r["dist"]
            for r in bfs_distances(df, max_iter=bound).collect()
        }
        got_cost = {
            r["node"]: r["cost"]
            for r in bellman_ford_khop(df, k=bound).collect()
        }
    finally:
        G.LOCAL_TRAVERSAL_EDGE_LIMIT = saved
    assert got_bfs == model_bfs(edges, seed, bound)
    assert got_cost == model_khop_cost(edges, seed, bound)


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
@given(graph(), st.integers(1, 4))
def test_traversal_mirror_matches_models(spark, edges, bound):
    """LOCAL numpy mirror (the default path at this scale) vs the same
    models — together with the distributed leg above this is a
    property-level parity proof over random graphs."""
    from echo_chambers_detection_spark.operators.graph import (
        bellman_ford_khop,
        bfs_distances,
    )

    df = spark.createDataFrame(edges, "u1 string, u2 string, weight long")
    seed = min({u for u, _, _ in edges} | {v for _, v, _ in edges})

    got_bfs = {
        r["node"]: r["dist"]
        for r in bfs_distances(df, max_iter=bound).collect()
    }
    assert got_bfs == model_bfs(edges, seed, bound)

    got_cost = {
        r["node"]: r["cost"]
        for r in bellman_ford_khop(df, k=bound).collect()
    }
    assert got_cost == model_khop_cost(edges, seed, bound)
