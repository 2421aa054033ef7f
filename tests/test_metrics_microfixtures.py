"""Closed-form metric checks on hand-computed graphs (FIXTURES.md §2),
mirroring the reference semantics at project/metrics/metrics.py:8-205.

Fixture: two triangles {a,b,c} and {d,e,f} joined by bridge (c,d);
labels {a,b,c}->0, {d,e,f}->1.

Hand-computed:
- conductance per community = cut / min(vol, 2m - vol) = 1/7
  (cut=1, vol=2*3+1=7, total_deg=14)
- density_internal = 3 / (3*2/2) = 1.0
- modularity: m=7, per community L_c=3, d_c=7:
  Q = 2*(3/7 - (7/14)^2) = 2*(3/7 - 1/4) = 5/14
- with orthogonal embeddings (community 0 -> e1, community 1 -> e2):
  cohesion=1, inter-sim=0 -> separation=1, ECS=1, variance=0,
  homophily = (6*1 + 1*0)/7 = 6/7
"""

from __future__ import annotations

import pytest

from echo_chambers_detection_spark.operators.metrics import (
    community_metrics,
    conductance_with_sentinel,
    global_metrics,
    modularity,
    restrict_to_members,
)

EDGES = [
    ("a", "b"), ("a", "c"), ("b", "c"),
    ("c", "d"),
    ("d", "e"), ("d", "f"), ("e", "f"),
]
LABELS = [("a", 0), ("b", 0), ("c", 0), ("d", 1), ("e", 1), ("f", 1)]
E1 = [1.0, 0.0]
E2 = [0.0, 1.0]
VECS = [("a", E1), ("b", E1), ("c", E1), ("d", E2), ("e", E2), ("f", E2)]


@pytest.fixture(scope="module")
def world(spark):
    edges = spark.createDataFrame(EDGES, "u1 string, u2 string")
    labels = spark.createDataFrame(LABELS, "node string, label int")
    emb = spark.createDataFrame(VECS, "node string, vector array<float>")
    return restrict_to_members(edges, labels, emb) + (emb,)


def test_community_metrics_closed_form(world):
    edges_m, members, emb = world
    rows = {
        r["label"]: r for r in community_metrics(edges_m, members, emb).collect()
    }
    for label in (0, 1):
        r = rows[label]
        assert r["size"] == 3
        assert r["internal_edge_count"] == 3
        assert r["density_internal"] == 1.0
        assert abs(r["conductance"] - 1 / 7) < 1e-12
        assert r["cohesion"] == 1.0
        assert r["separation"] == 1.0  # 1 - 0
        assert r["ecs"] == 1.0
        assert r["variance"] == 0.0
        assert r["homophily"] == 1.0


def test_global_metrics_closed_form(world):
    edges_m, members, emb = world
    g = global_metrics(edges_m, members, emb).first()
    assert abs(g["homophily"] - 6 / 7) < 1e-12
    assert g["cohesion"] == 1.0
    assert g["separation"] == 1.0
    assert g["ecs"] == 1.0


def test_modularity_closed_form(world):
    edges_m, members, _ = world
    q = modularity(edges_m, members).first()["modularity"]
    assert abs(q - 5 / 14) < 1e-12


def test_modularity_null_when_single_community(spark):
    edges = spark.createDataFrame([("a", "b"), ("b", "c")], "u1 string, u2 string")
    labels = spark.createDataFrame(
        [("a", 0), ("b", 0), ("c", 0)], "node string, label int"
    )
    emb = spark.createDataFrame(
        [("a", E1), ("b", E1), ("c", E1)], "node string, vector array<float>"
    )
    edges_m, members = restrict_to_members(edges, labels, emb)
    q = modularity(edges_m, members).first()["modularity"]
    assert q is None  # reference returns NaN (metrics.py:92-93)


def test_conductance_sentinel_single_community(spark):
    """One community covering the whole graph: outside volume = 0 ->
    sentinel 10000 (reference metrics.py:120)."""
    edges = spark.createDataFrame([("a", "b")], "u1 string, u2 string")
    labels = spark.createDataFrame([("a", 0), ("b", 0)], "node string, label int")
    emb = spark.createDataFrame(
        [("a", E1), ("b", E1)], "node string, vector array<float>"
    )
    edges_m, members = restrict_to_members(edges, labels, emb)
    r = conductance_with_sentinel(edges_m, members).first()
    assert r["conductance"] == 10000.0


def test_member_restriction_drops_unembedded(spark):
    """A node without an embedding is excluded and its edges vanish
    (reference metrics_interface.py:95-108)."""
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "z")], "u1 string, u2 string"
    )
    labels = spark.createDataFrame(
        [("a", 0), ("b", 0), ("z", 1)], "node string, label int"
    )
    emb = spark.createDataFrame(
        [("a", E1), ("b", E1)], "node string, vector array<float>"
    )
    edges_m, members = restrict_to_members(edges, labels, emb)
    assert edges_m.count() == 1
    assert members.count() == 2
    rows = community_metrics(edges_m, members, emb).collect()
    assert len(rows) == 1 and rows[0]["label"] == 0
