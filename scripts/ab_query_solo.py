"""Single-version solo probe for any catalog query or bench graph probe:
fresh JVM, N in-process reps, job-count + wall per rep.

Usage: python scripts/ab_query_solo.py <package_root> <name> <reps> [sf_dir]

<name> is either a catalog query name (run at sf_dir, default sf0.1) or
one of the synthetic probes: bench_louvain_planted_5m.

Run alternately against /root/repo and a worktree of the commit under
comparison to A/B with host drift cancelled at the process level
(VERDICT r9 #1 methodology). Job counts are host-noise-IMMUNE: a plan
regression changes them, a slow host does not.
"""

from __future__ import annotations

import sys
import time

root, name, reps = sys.argv[1], sys.argv[2], int(sys.argv[3])
sf_dir = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.1"
sys.path.insert(0, root)

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[32]")
    .appName("ab-query-solo")
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


def run_once():
    if name == "bench_louvain_planted_5m":
        import echo_chambers_detection_spark.operators.graph as G
        from echo_chambers_detection_spark.operators.planted import (
            planted_partition_edges,
        )

        e = planted_partition_edges(
            spark, 50, 2000, 25, bridges=True, partitions=64
        )
        out = G.louvain(e, max_levels=2, max_rounds=4)
        out.count()
        return
    from echo_chambers_detection_spark.catalog import QUERY_REGISTRY

    QUERY_REGISTRY[name].spark(spark, sf_dir).count()


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
