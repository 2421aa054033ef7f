"""Benchmark harness: runs headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from echo_chambers_detection_spark.catalog import QUERY_REGISTRY
from echo_chambers_detection_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# One representative query per hot code-path family, run at sf0.001
# before timing. First execution of a query shape pays JIT/codegen
# compilation, not data: ngram_jaccard_pairs measured 13.4s cold vs
# 5.8s warm at sf0.1, and 8.3s cold even at sf0.001 — so timing a cold
# shape measures the compiler. ~35s of tiny-SF warm-up removes a
# 20%+ run-to-run swing from the measured pass.
_WARMUP_QUERIES = [
    "ngram_jaccard_pairs",        # shingle explode + self-join + agg
    "coengagement_edges",         # big self-join + shuffle-hash
    "embedding_near_dup",         # applyInPandas GEMM tiles
    "louvain_user_communities",   # iterative loop + localgraph mirrors
    "tumbling_event_counts",      # window aggregation
    "ann_topk",                   # codegen vector exprs + TakeOrdered
    "minhash_lsh_candidates",     # minhash + band equi-join
    "simhash_near_pairs",         # bitwise banding
    "knn_graph_topk",             # tiled per-row top-k + window
    "density_clusters",           # FastRP + GEMM + components
    "scd2_membership_history",    # SCD-2 window/semi-join family
    "hdbscan_clusters",           # Boruvka/condense driver tail
]
_WARMUP_SF_DIR = os.environ.get(
    "SPARK_GRAFT_WARMUP_SF_DIR", "/root/testdata/sf0.001"
)

# Host-drift calibration (VERDICT r4 #6): three pinned probe queries
# spanning distinct subsystems (scan+agg, self-join+shuffle, vector
# codegen) run right after warm-up, before the timed pass. The
# canonical seconds were measured on the round-5 machine; the emitted
# "drift" ratio (median measured/canonical) lets later rounds separate
# host slowdown from real regressions without manual worktree A/Bs
# (r4 burned a session proving a +21% "regression" was a slower host).
_DRIFT_PROBES = {
    "pricing_summary": 1.39,
    "coengagement_top_pairs": 2.52,
    "ann_topk": 0.54,
}


def _synth_clustered(spark, n: int, d: int = 16, kc: int = 50):
    """Deterministic clustered vectors built ENTIRELY from JVM
    expressions (no driver data, no RNG): node i belongs to planted
    center i mod kc; dim j = hash-derived center value + small
    hash-derived per-node noise. Purpose-built to push n past the
    measured auto-switch crossovers so the at-scale default paths get
    a timed bench row (VERDICT r4 #7)."""
    from pyspark.sql import functions as F

    df = spark.range(n).select(
        F.col("id").cast("string").alias("node"),
        F.pmod(F.col("id"), F.lit(kc)).alias("_c"),
        F.col("id").alias("_i"),
    )
    cols = []
    for j in range(d):
        center = F.pmod(F.xxhash64(F.col("_c"), F.lit(j)), F.lit(1000)) / 250.0
        noise = (
            F.pmod(F.xxhash64(F.col("_i"), F.lit(j + 7777)), F.lit(1000))
            / 10000.0
        )
        cols.append(center + noise)
    return df.select("node", F.array(*cols).alias("vector"))


def _at_scale_probes(spark, timings: dict) -> None:
    """Bench-only synthetic rows ABOVE the measured crossovers, so the
    auto-switch paths run in the timed bench rather than only in unit
    tests (VERDICT r4 #7): hdbscan_cluster(knn_mode='auto') at 40k
    nodes takes the IVF-candidate k-NN branch (crossover 32k) and the
    contracted-forest condense. Keys are prefixed bench_ and excluded
    from the catalog total (they have no sf-scaled input)."""
    import time

    from echo_chambers_detection_spark.operators.hdbscan import (
        hdbscan_cluster,
    )

    emb = _synth_clustered(spark, n=40_000)
    t0 = time.perf_counter()
    hdbscan_cluster(
        emb, min_pts=4, min_cluster_size=4, k=8, knn_mode="auto", nprobe=4
    ).write.format("noop").mode("overwrite").save()
    timings["bench_hdbscan_auto_40k"] = round(time.perf_counter() - t0, 3)


def main() -> None:
    spark = get_spark(app_name="bench")
    timings: dict[str, float] = {}

    def release_persisted() -> None:
        """Drop cached data left by the previous query so one query's
        working set can't throttle the next. The explicit System.gc()
        matters: broadcast variables and shuffle files are only reclaimed
        when the driver's ContextCleaner sees their references collected,
        and a 48g heap may not GC at all inside a 6-minute bench —
        iterative queries mid-run were measured 2-3x slower than solo
        purely from that accumulation.

        Locally-checkpointed RDDs are EXEMPT from the sweep (VERDICT r2
        #2): the iterative operators retire their own dead generations
        via graph._release_checkpoint, so what remains here is only the
        final result leaf of the just-finished query — tiny, and
        reclaimed by the ContextCleaner once the Python reference dies
        at the next loop iteration (System.gc below accelerates that)."""
        jsc = spark.sparkContext._jsc
        for rdd in jsc.getPersistentRDDs().values():
            if not rdd.rdd().isLocallyCheckpointed():
                rdd.unpersist()
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()

    # Warm JIT/codegen/parquet-footer paths so timings measure the
    # queries, not first-execution compilation (see _WARMUP_QUERIES).
    for _wq in _WARMUP_QUERIES:
        if _wq in QUERY_REGISTRY and os.path.isdir(_WARMUP_SF_DIR):
            QUERY_REGISTRY[_wq].spark(spark, _WARMUP_SF_DIR).write.format(
                "noop"
            ).mode("overwrite").save()
    next(iter(QUERY_REGISTRY.values())).spark(spark, SF_DIR).count()
    # The persisted-IVF query's contract is probe-only steady state (the
    # build is amortized infrastructure, like the standing Qdrant
    # collection it mirrors) — run it once here so the build lands in
    # warm-up, not in the timed pass.
    for _probe_q in ("ann_ivf_probe_topk", "ann_pq_probe_topk"):
        if _probe_q in QUERY_REGISTRY:
            QUERY_REGISTRY[_probe_q].spark(spark, SF_DIR).write.format(
                "noop"
            ).mode("overwrite").save()
    release_persisted()

    # ALWAYS-WARM protocol (round-5 review finding): touch every input
    # file's bytes once so the OS page cache is in a DECLARED state
    # before both the drift probes and the timed pass. Without this the
    # cold-read component of the first queries depended on whatever
    # prior activity (testdata generation, tests) happened to leave
    # cached — nondeterministic across rounds and machines. Rounds
    # compare warm-vs-warm from r5 on; treat cross-round deltas against
    # r4-and-earlier at the ±5% level.
    import glob as _glob

    _repo = os.path.dirname(os.path.abspath(__file__))
    _warm_files = _glob.glob(os.path.join(SF_DIR, "*.parquet")) + _glob.glob(
        # the persisted IVF/PQ index parquet the probe queries read
        os.path.join(_repo, ".cache", "**", "*.parquet"),
        recursive=True,
    )
    for _f in _warm_files:
        with open(_f, "rb") as _fh:
            while _fh.read(1 << 22):
                pass

    # host-drift probes: warm shapes, same machine-state as the timed
    # pass start; ratio > 1 means this host is slower than the machine
    # the canonicals were pinned on
    drift_raw: dict[str, float] = {}
    for _dq in _DRIFT_PROBES:
        t0 = time.perf_counter()
        QUERY_REGISTRY[_dq].spark(spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        drift_raw[_dq] = round(time.perf_counter() - t0, 3)
        release_persisted()
    ratios = sorted(
        drift_raw[q] / _DRIFT_PROBES[q] for q in _DRIFT_PROBES
    )
    drift = round(ratios[len(ratios) // 2], 3)

    t_total = time.perf_counter()
    for name, spec in QUERY_REGISTRY.items():
        t0 = time.perf_counter()
        df = spec.spark(spark, SF_DIR)
        # foreach-noop forces full materialization without driver collect
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)
        release_persisted()
    total = round(time.perf_counter() - t_total, 3)

    # synthetic at-scale rows (bench_-prefixed, outside the total)
    _at_scale_probes(spark, timings)

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": "catalog_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf else None,
                "drift": drift,
                "drift_probes": drift_raw,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
