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
    assert n <= 49, f"label propagation grew to {n} jobs (was 38)"


def test_leiden_distributed_job_count(spark, monkeypatch):
    monkeypatch.setattr(G, "LOCAL_GRAPH_EDGE_LIMIT", 0)
    e = planted_partition_edges(spark, 4, 60, 5, bridges=True, partitions=4)
    n = _count_jobs(
        spark, lambda: G.leiden(e, max_levels=2, max_rounds=2).count()
    )
    assert n <= 180, f"distributed leiden grew to {n} jobs (was 139)"


def test_contract_and_two_level_job_counts(spark):
    """Round-10 pins for the condense chain's distributed half: the
    caterpillar contraction must stay ONE absorbing round + exact-exit
    arithmetic (no pointer-jump joins, no post-round degree rebuild),
    and the two-level condense one CC pass + one cogroup. Measured on
    the round-10 code (local[8], shuffle=8): contract=28, two_level=56."""
    from echo_chambers_detection_spark.operators.hdbscan import (
        condense_two_level,
        contract_runt_fringes,
    )

    H = 200
    hub = F.format_string("h%06d", F.col("id") % H)
    leaves = spark.range(0, 9 * H, 1, 4).select(
        hub.alias("u1"),
        F.format_string(
            "h%06dx%d", F.col("id") % H, F.floor(F.col("id") / H)
        ).alias("u2"),
        (F.lit(0.001) + F.col("id") * 1e-9).alias("w"),
    )
    chain = spark.range(0, H - 1, 1, 2).select(
        F.format_string("h%06d", F.col("id")).alias("u1"),
        F.format_string("h%06d", F.col("id") + 1).alias("u2"),
        (F.lit(1.0) + F.col("id") * 1e-4).alias("w"),
    )
    forest = leaves.unionAll(chain).localCheckpoint(eager=True)
    # manual tracker counting: _count_jobs sweeps ALL persisted blocks
    # after fn, which would free the contracted frames the second
    # phase still reads — sweep once at the end instead
    tracker = spark.sparkContext.statusTracker()
    j0 = len(tracker.getJobIdsForGroup(None))
    c_e, c_n, _ = contract_runt_fringes(forest, min_cluster_size=10)
    n_contract = len(tracker.getJobIdsForGroup(None)) - j0
    j1 = len(tracker.getJobIdsForGroup(None))
    condense_two_level(c_e, c_n, min_cluster_size=10, driver_rows=120).count()
    n_two = len(tracker.getJobIdsForGroup(None)) - j1
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for i in list(jmap.keySet().toArray()):
        jrdd = jmap.get(i)
        if jrdd is not None:
            jrdd.unpersist(False)
    assert n_contract <= 37, (
        f"contract_runt_fringes grew to {n_contract} jobs (was 28)"
    )
    assert n_two <= 73, f"condense_two_level grew to {n_two} jobs (was 56)"


def test_ktruss_job_count(spark):
    """The incremental k-truss (triangles enumerated once, support
    maintained by anti-joins) is the last heavy bench family without a
    host-noise-immune pin: an extra per-round pass or a lost
    incremental shortcut shows up here, a slow host does not.
    Measured 34 on the round-10 code (local[8], shuffle=8)."""
    from echo_chambers_detection_spark.operators.triangles import (
        ktruss_edges,
    )

    e = planted_partition_edges(spark, 4, 60, 5, bridges=True, partitions=4)
    n = _count_jobs(
        spark, lambda: ktruss_edges(e.select("u1", "u2"), k=4).count()
    )
    assert n <= 45, f"incremental k-truss grew to {n} jobs (was 34)"


def test_triangle_counts_job_count(spark):
    """Triangle enumeration is one oriented wedge + closure join
    pipeline — a bounded-job pass, no loop. Measured 4 on the
    round-10 code (local[8], shuffle=8); the bench row's wall swings
    with the host, this cannot."""
    from echo_chambers_detection_spark.operators.triangles import (
        triangle_counts,
    )

    e = planted_partition_edges(spark, 4, 60, 5, bridges=True, partitions=4)
    n = _count_jobs(
        spark, lambda: triangle_counts(e.select("u1", "u2")).count()
    )
    assert n <= 6, f"triangle_counts grew to {n} jobs (was 4)"


def test_brandes_distributed_job_count(spark, monkeypatch):
    """Forward sigma loop + ONE DAG join + level-by-level backward aggs:
    an extra per-level pass (e.g. losing the materialized DAG and
    re-joining state every round) roughly doubles this."""
    monkeypatch.setattr(G, "LOCAL_TRAVERSAL_EDGE_LIMIT", 0)
    e = planted_partition_edges(
        spark, 4, 60, 5, bridges=True, partitions=4
    ).localCheckpoint(eager=True)
    n = _count_jobs(
        spark,
        lambda: G.brandes_betweenness(
            e.select("u1", "u2"), n_sources=4, max_iter=8
        ).count(),
    )
    e.unpersist()
    assert n <= 117, f"distributed brandes grew to {n} jobs (was 90)"
