"""Triangle counting / transitivity / assortativity (operators/triangles.py).

Closed-form micro-fixtures; the catalog-level DuckDB oracles
(triangle_counts, transitivity_stats, degree_assortativity_moments,
triangle_counts_planted) are exercised by tests/test_catalog_oracle.py.
"""

from __future__ import annotations

from itertools import combinations

from echo_chambers_detection_spark.operators.triangles import (
    degree_assortativity_moments,
    transitivity_stats,
    triangle_counts,
    triangle_vertices,
)


def _edges(spark, pairs):
    canon = sorted({(min(a, b), max(a, b)) for a, b in pairs})
    return spark.createDataFrame(canon, ["u1", "u2"])


def test_k4_every_node_in_three_triangles(spark):
    e = _edges(spark, combinations(["a", "b", "c", "d"], 2))
    rows = {r["node"]: r for r in triangle_counts(e).collect()}
    assert len(rows) == 4
    for r in rows.values():
        assert (r["triangles"], r["deg"], r["wedges"]) == (3, 3, 3)
    tris = triangle_vertices(e).collect()
    assert len(tris) == 4
    # each triangle appears exactly once, as a set
    assert len({frozenset((t["a"], t["b"], t["c"])) for t in tris}) == 4


def test_path_has_zero_triangles_but_all_nodes_reported(spark):
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    rows = {r["node"]: r["triangles"] for r in triangle_counts(e).collect()}
    assert rows == {"a": 0, "b": 0, "c": 0, "d": 0}


def test_hub_orientation_finds_triangle_at_low_rank_apex(spark):
    # star center + one closing edge: the only triangle's apex must be a
    # LEAF under degree ordering — the hub never fans out wedges
    e = _edges(
        spark,
        [("s", f"l{i}") for i in range(1, 5)] + [("l1", "l2")],
    )
    rows = {r["node"]: r for r in triangle_counts(e).collect()}
    assert rows["s"]["triangles"] == 1
    assert rows["l1"]["triangles"] == 1 and rows["l2"]["triangles"] == 1
    assert rows["l3"]["triangles"] == 0 and rows["l4"]["triangles"] == 0
    assert rows["s"]["deg"] == 4 and rows["s"]["wedges"] == 6


def test_transitivity_stats_k4(spark):
    e = _edges(spark, combinations(["a", "b", "c", "d"], 2))
    row = transitivity_stats(e).first()
    assert (
        row["n_nodes"], row["n_edges"], row["n_triangles"], row["n_wedges"]
    ) == (4, 6, 4, 12)
    # K4 transitivity: 3*4/12 == 1
    assert 3 * row["n_triangles"] == row["n_wedges"]


def test_assortativity_moments_star(spark):
    # star(1+3): center degree 3, leaves degree 1; both orientations
    row = degree_assortativity_moments(
        _edges(spark, [("c", "x"), ("c", "y"), ("c", "z")])
    ).first()
    assert (row["m2"], row["s_x"], row["s_xx"], row["s_xy"]) == (
        6, 12, 30, 18,
    )
    # perfectly disassortative: r = (m2*s_xy - s_x^2)/(m2*s_xx - s_x^2)
    r = (6 * 18 - 12 * 12) / (6 * 30 - 12 * 12)
    assert r == -1.0


def test_planted_circulant_closed_form(spark):
    # C_25(1..5) blocks: every node deg 10, 30 triangles, 45 wedges
    from echo_chambers_detection_spark.operators.planted import (
        planted_partition_edges,
    )

    e = planted_partition_edges(
        spark, 2, 25, 5, bridges=False, offsets="linear"
    ).select("u1", "u2")
    rows = triangle_counts(e).collect()
    assert len(rows) == 50
    for r in rows:
        assert (r["triangles"], r["deg"], r["wedges"]) == (30, 10, 45)


def test_strong_tie_backbone_keeps_topk_per_node(spark):
    from echo_chambers_detection_spark.operators.triangles import (
        strong_tie_backbone,
    )

    # hub h with weighted edges to 4 leaves; k=2 keeps h's two heaviest,
    # but every leaf keeps its only edge -> all 4 survive via the leaves
    e = spark.createDataFrame(
        [("h", "l1", 5.0), ("h", "l2", 4.0), ("h", "l3", 3.0),
         ("h", "l4", 2.0)],
        "u1 string, u2 string, weight double",
    )
    kept = {(r["u1"], r["u2"]) for r in strong_tie_backbone(e, k=2).collect()}
    assert kept == {("h", "l1"), ("h", "l2"), ("h", "l3"), ("h", "l4")}

    # isolate the top-k-per-node effect: leaves now have an alternative
    # heavier edge, so h's weak edges are kept by NOBODY
    e2 = spark.createDataFrame(
        [("h", "l1", 5.0), ("h", "l2", 4.0), ("h", "l3", 1.0),
         ("h", "l4", 1.0),
         ("l3", "x", 9.0), ("l3", "y", 8.0),
         ("l4", "x", 9.0), ("l4", "y", 8.0),
         ("x", "y", 9.5)],
        "u1 string, u2 string, weight double",
    )
    kept2 = {
        tuple(sorted((r["u1"], r["u2"])))
        for r in strong_tie_backbone(e2, k=2).collect()
    }
    assert ("h", "l3") not in kept2 and ("h", "l4") not in kept2
    assert ("h", "l1") in kept2 and ("h", "l2") in kept2


def _kt_edges(spark, pairs):
    return spark.createDataFrame(pairs, "u1 string, u2 string")


def test_ktruss_keeps_clique_drops_tail(spark):
    from echo_chambers_detection_spark.operators.triangles import ktruss_edges

    # K4 (every edge support 2) with a pendant triangle hanging off one
    # vertex: the pendant triangle's edges have support 1 -> pruned at
    # k=4, K4 survives with support 2
    k4 = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d")]
    pendant = [("d", "x"), ("d", "y"), ("x", "y")]
    got = {
        (r["u1"], r["u2"]): r["support"]
        for r in ktruss_edges(_kt_edges(spark, k4 + pendant), k=4).collect()
    }
    assert got == {e: 2 for e in k4}


def test_ktruss_cascades_require_iteration(spark):
    from echo_chambers_detection_spark.operators.triangles import ktruss_edges

    # triangle strip s0-s9: interior rungs have support 2, so a ONE-PASS
    # support filter at k=4 would keep them — but the ends and chords
    # (support 1) fall in round one, leaving the rungs triangle-free,
    # and round two empties the graph. Fixpoint must be empty.
    rungs = [(f"s{i}", f"s{i+1}") for i in range(9)]
    chords = [(f"s{i}", f"s{i+2}") for i in range(8)]
    out = ktruss_edges(_kt_edges(spark, rungs + chords), k=4)
    assert out.count() == 0


def test_ktruss_raises_on_max_rounds_exhaustion(spark):
    """A partial (non-fixpoint) result must raise like
    connected_components does, not return a non-truss with a stale
    support column (ADVICE r9). The strip fixture needs two pruning
    rounds; max_rounds=1 must therefore fail loudly."""
    import pytest as _pytest

    from echo_chambers_detection_spark.operators.triangles import ktruss_edges

    rungs = [(f"s{i}", f"s{i+1}") for i in range(9)]
    chords = [(f"s{i}", f"s{i+2}") for i in range(8)]
    with _pytest.raises(RuntimeError, match="k-truss"):
        ktruss_edges(_kt_edges(spark, rungs + chords), k=4, max_rounds=1)


def test_ktruss_k3_is_triangle_support_filter(spark):
    from echo_chambers_detection_spark.operators.triangles import ktruss_edges

    # k=3 keeps every edge in at least one triangle (support >= 1);
    # the bridge edge between two triangles is in none -> dropped
    tri1 = [("a", "b"), ("a", "c"), ("b", "c")]
    tri2 = [("p", "q"), ("p", "r"), ("q", "r")]
    bridge = [("c", "p")]
    got = {
        (r["u1"], r["u2"])
        for r in ktruss_edges(_kt_edges(spark, tri1 + tri2 + bridge), k=3).collect()
    }
    assert got == set(tri1) | set(tri2)
