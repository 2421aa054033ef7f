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
    must_stamp_r4 = {
        # new this round — never stamped
        "knn_graph_ann_topk", "ann_ivf_probe_topk",
        "simhash64_near_pairs", "language_id_trigram_pred",
        "bpe_token_stats", "text_scrub_stats", "ann_int8_topk",
        "ann_pq_topk", "ann_pq_probe_topk",
        "c4_quality_flags", "winnowing_fingerprints",
        # rotated out of r3's window — last stamped r2, restamp now
        "embedding_near_dup", "multimodal_blob_stats",
        "membership_with_labels", "pricing_summary", "revenue_by_nation",
        "top_orders", "customers_without_orders", "active_customers",
        "top3_orders_per_customer", "event_type_stats",
        "engagement_union", "ann_extremes", "text_token_stats",
        # code changed in round 4 — restamp after the change
        "knn_graph_topk", "doc_repetition_scores", "doc_fingerprints",
        "language_id_pred", "minhash_lsh_candidates",
        "ngram_jaccard_pairs", "near_dup_keep_list",
    }
    missing = must_stamp_r4 - set(window)
    assert not missing, f"outside the driver window: {sorted(missing)}"
