"""Solo probe for the SYNTHETIC bench rows (fixtures built from
spark.range, no sf_dir): fresh JVM, N in-process reps, wall + job
count per rep. Job counts are host-noise-immune — a plan regression
changes them, a slow host does not (VERDICT r9 #1 methodology; this
is the `ab_query_solo.py` sibling for rows that aren't catalog
queries).

Usage: python scripts/ab_bench_synthetic_solo.py <package_root> <probe> <reps>

Probes: pagerank_factored_celebrity | interarrival_10m | sessionization_10m
"""

from __future__ import annotations

import sys
import time

root, name, reps = sys.argv[1], sys.argv[2], int(sys.argv[3])
sys.path.insert(0, root)

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

spark = (
    SparkSession.builder.master("local[32]")
    .appName("ab-bench-synth-solo")
    .config("spark.sql.shuffle.partitions", "64")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.driver.memory", "48g")
    .config("spark.ui.enabled", "false")
    .config("spark.cleaner.periodicGC.interval", "45s")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import echo_chambers_detection_spark  # noqa: F401

assert echo_chambers_detection_spark.__file__.startswith(root)


def njobs():
    return len(spark.sparkContext.statusTracker().getJobIdsForGroup(None))


def release_all():
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for i in list(jmap.keySet().toArray()):
        jrdd = jmap.get(i)
        if jrdd is not None:
            jrdd.unpersist(False)
    spark.catalog.clearCache()


def _events_10m():
    # the EXACT bench fixture (bench.py::_interarrival_scale_probe):
    # 100k users x 100 events, user u's cadence = (u % 7 + 1) s, the
    # event type cycles seq % 3
    N_USERS = 100_000
    return (
        spark.range(0, N_USERS * 100, 1, 64)
        .select(
            (F.col("id") % N_USERS).alias("user_id"),
            F.expr(f"id DIV {N_USERS}").alias("seq"),
            F.col("id").alias("event_id"),
        )
        .select(
            "user_id",
            "event_id",
            F.timestamp_millis(
                F.col("seq") * (F.col("user_id") % 7 + 1) * 1000
            ).alias("ts"),
            F.concat(F.lit("t"), (F.col("seq") % 3)).alias("event_type"),
        )
    )


def run_once():
    if name == "pagerank_factored_celebrity":
        from echo_chambers_detection_spark.operators.graph import (
            pagerank_coengagement,
        )

        n = 100_000
        base = spark.range(0, n, 1, 32).select(
            F.lpad(F.col("id").cast("string"), 6, "0").alias("user_did"),
            F.col("id"),
        )
        eng = base.select(
            "user_did", F.lit("CELEB").alias("post_uri")
        ).unionAll(
            base.select(
                "user_did",
                F.concat(
                    F.lit("pair"),
                    F.floor(F.col("id") / 2).cast("string"),
                ).alias("post_uri"),
            )
        )
        out = pagerank_coengagement(eng, damping=0.85, max_iter=3, tol=0.0)
        out.localCheckpoint(eager=True).unpersist()
    elif name == "interarrival_10m":
        from echo_chambers_detection_spark.operators.eventstats import (
            interarrival_gap_stats,
        )

        interarrival_gap_stats(_events_10m()).collect()
    elif name == "sessionization_10m":
        from echo_chambers_detection_spark.operators.eventstats import (
            user_session_stats,
        )

        user_session_stats(_events_10m(), gap_limit_ms=4000).groupBy(
            "n_sessions"
        ).count().collect()
    else:
        raise SystemExit(f"unknown probe {name}")


times, jobs = [], []
for i in range(reps):
    j0, t0 = njobs(), time.perf_counter()
    run_once()
    dt, dj = time.perf_counter() - t0, njobs() - j0
    release_all()
    times.append(round(dt, 3))
    jobs.append(dj)
    print(f"rep{i}: {dt:.3f}s jobs={dj}", flush=True)
    spark.sparkContext._jvm.System.gc()

print(f"SOLO {root} {name} times={times} jobs={jobs}", flush=True)
