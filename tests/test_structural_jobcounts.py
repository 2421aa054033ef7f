"""Host-noise-IMMUNE structural pins for the bench-regression families
(VERDICT r9 #1): Spark JOB COUNTS on fixed fixtures. A plan regression
(an extra per-round pass, a lost incremental-maintenance shortcut, a
barrier that reappears) changes the job count; a slow shared host does
not. Bounds carry ~30% headroom over the measured counts so AQE jitter
never flakes, while a 2x plan blowup still fails loudly.

Measured on the round-10 code (local[8], shuffle=8): density_lsh=22,
simhash64_banded=7, louvain_dist=89, leiden_dist=139."""

from __future__ import annotations

from pyspark.sql import functions as F

import echo_chambers_detection_spark.operators.graph as G
from echo_chambers_detection_spark.operators.planted import (
    planted_arc_embeddings,
    planted_partition_edges,
)


def _count_jobs(spark, fn):
    tracker = spark.sparkContext.statusTracker()
    j0 = len(tracker.getJobIdsForGroup(None))
    fn()
    n = len(tracker.getJobIdsForGroup(None)) - j0
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for i in list(jmap.keySet().toArray()):
        jrdd = jmap.get(i)
        if jrdd is not None:
            jrdd.unpersist(False)
    return n


def test_density_lsh_job_count(spark):
    """BENCH_r09's density_clusters_lsh 3.1x wall swing had no plan
    change behind it — this pin makes that checkable: LSH candidate
    generation + rerank + CC must stay a bounded-job pipeline."""
    emb = planted_arc_embeddings(spark, 5, 50).localCheckpoint(eager=True)
    n = _count_jobs(
        spark,
        lambda: G.density_cluster(
            emb, min_sim=0.6, min_pts=2, use_lsh=True,
            lsh_num_planes=16, lsh_band_bits=4, dim=2,
        ).count(),
    )
    emb.unpersist()
    assert n <= 29, f"density_cluster(use_lsh) grew to {n} jobs (was 22)"


def test_simhash64_banded_job_count(spark):
    from echo_chambers_detection_spark.operators.dedup import (
        simhash64,
        simhash_candidate_pairs_banded,
    )

    docs = spark.createDataFrame(
        [
            (str(i), " ".join(f"w{(i * j) % 17}" for j in range(30)))
            for i in range(200)
        ],
        "doc_id string, text string",
    )
    n = _count_jobs(
        spark,
        lambda: simhash_candidate_pairs_banded(
            simhash64(docs), max_hamming=3
        ).count(),
    )
    assert n <= 10, f"simhash64 banded pairs grew to {n} jobs (was 7)"


def test_louvain_distributed_job_count(spark, monkeypatch):
    monkeypatch.setattr(G, "LOCAL_GRAPH_EDGE_LIMIT", 0)
    e = planted_partition_edges(spark, 4, 60, 5, bridges=True, partitions=4)
    n = _count_jobs(
        spark, lambda: G.louvain(e, max_levels=2, max_rounds=2).count()
    )
    assert n <= 116, f"distributed louvain grew to {n} jobs (was 89)"


def test_lpa_job_count(spark):
    e = planted_partition_edges(spark, 4, 60, 5, bridges=True, partitions=4)
    n = _count_jobs(
        spark,
        lambda: G.label_propagation(
            e.select("u1", "u2"), max_iter=5
        ).count(),
    )
    assert n <= 62, f"label propagation grew to {n} jobs (was 48)"


def test_leiden_distributed_job_count(spark, monkeypatch):
    monkeypatch.setattr(G, "LOCAL_GRAPH_EDGE_LIMIT", 0)
    e = planted_partition_edges(spark, 4, 60, 5, bridges=True, partitions=4)
    n = _count_jobs(
        spark, lambda: G.leiden(e, max_levels=2, max_rounds=2).count()
    )
    assert n <= 180, f"distributed leiden grew to {n} jobs (was 139)"
