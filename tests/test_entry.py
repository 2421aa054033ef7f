"""Smoke test for the driver contract (__spark_entry__)."""

from __future__ import annotations

import __spark_entry__ as entry_mod


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"u1", "u2", "weight", "handle"}
    first = rows[0]
    assert first.u1 < first.u2
    assert first.weight >= 1


def test_queries_and_oracles_aligned():
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert set(o).issubset(set(q))
    assert len(q) > 0


def test_registry_window_covers_unverified_queries():
    """The correctness driver hashes only the FIRST 50 registry entries
    (VERDICT r2 #1). Queries that have never had a green driver row —
    plus anything newly registered — must sit inside that window."""
    from echo_chambers_detection_spark.catalog import QUERY_REGISTRY

    window = list(QUERY_REGISTRY)[:50]
    never_verified = {
        "event_value_percentiles", "event_type_user_cube",
        "embedded_documents", "ann_lsh_topk", "embedding_lsh_near_dup",
        "density_clusters_lsh", "hdbscan_clusters", "knn_graph_topk",
        "doc_repetition_scores",
        # green in round 1 only — need a second-era stamp
        "kafka_producer_messages", "order_stats_rollup",
        "engaged_user_set_ops", "user_profiles_cleaned",
    }
    missing = never_verified - set(window)
    assert not missing, f"outside the driver window: {sorted(missing)}"
