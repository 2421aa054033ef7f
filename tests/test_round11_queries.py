"""Round-11 additions: landmark closeness/harmonic centrality — the
micro-fixture arithmetic is hand-computed on a 4-chain, and the result
must be identical through the local-mirror and distributed BFS paths
(the operator is one groupBy over bfs_landmark_distances)."""

from __future__ import annotations

import pytest

import echo_chambers_detection_spark.operators.graph as G


def _chain(spark):
    # a - b - c - d; landmarks (3 binary-smallest) = a, b, c
    return spark.createDataFrame(
        [("a", "b", 1.0), ("b", "c", 1.0), ("c", "d", 1.0)],
        "u1 string, u2 string, weight double",
    )


# (node, n_reached, dist_sum, harmonic_q9, closeness_q9) over seeds
# a/b/c: dist rows a:(0,1,2) b:(1,0,1) c:(2,1,0) d:(3,2,1)
_EXPECT = {
    ("a", 3, 3, 1_500_000_000, 1_000_000_000),
    ("b", 3, 2, 2_000_000_000, 1_500_000_000),
    ("c", 3, 3, 1_500_000_000, 1_000_000_000),
    ("d", 3, 6, 1_833_333_333, 500_000_000),
}


def _rows(df):
    return {
        (
            r["node"],
            r["n_landmarks_reached"],
            r["dist_sum"],
            r["harmonic_q9"],
            r["closeness_q9"],
        )
        for r in df.collect()
    }


def test_landmark_closeness_closed_form(spark):
    got = _rows(G.landmark_closeness(_chain(spark), n_landmarks=3))
    assert got == _EXPECT


def test_landmark_closeness_distributed_parity(spark, monkeypatch):
    monkeypatch.setattr(G, "LOCAL_TRAVERSAL_EDGE_LIMIT", 0)
    got = _rows(G.landmark_closeness(_chain(spark), n_landmarks=3))
    assert got == _EXPECT


def test_landmark_closeness_hop_bound(spark):
    # max_iter=1: d is only reached by landmark c (dist 1); a and c
    # miss each other (2 hops), so their sums shrink accordingly
    got = _rows(
        G.landmark_closeness(_chain(spark), n_landmarks=3, max_iter=1)
    )
    assert ("d", 1, 1, 1_000_000_000, 1_000_000_000) in got
    assert ("a", 2, 1, 1_000_000_000, 2_000_000_000) in got
