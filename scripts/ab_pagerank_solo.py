"""Single-version pagerank probe: fresh JVM, N in-process reps.

Usage: python scripts/ab_pagerank_solo.py <package_root> <reps>
Prints one line per rep and a trailing summary. Run alternately against
/root/repo and /root/repo/.ab_r7 to A/B with host drift cancelled at the
process level and any cross-version module-state confound removed.
"""

from __future__ import annotations

import sys
import time

root, reps = sys.argv[1], int(sys.argv[2])
sys.path.insert(0, root)

from pyspark.sql import SparkSession, functions as F

spark = (
    SparkSession.builder.master("local[32]")
    .appName("ab-pagerank-solo")
    .config("spark.sql.shuffle.partitions", "64")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.driver.memory", "48g")
    .config("spark.ui.enabled", "false")
    .config("spark.cleaner.periodicGC.interval", "45s")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import echo_chambers_detection_spark.operators.graph as G
from echo_chambers_detection_spark.operators.planted import (
    planted_partition_edges,
)

assert G.__file__.startswith(root), G.__file__
NB, BS = 50, 2000
times = []
for i in range(reps):
    edges = planted_partition_edges(spark, NB, BS, 25, bridges=False, partitions=64)
    t0 = time.perf_counter()
    ranks = G.pagerank(edges.select("u1", "u2"), max_iter=5, tol=0.0).localCheckpoint(eager=True)
    dt = time.perf_counter() - t0
    dev = ranks.agg(F.max(F.abs(F.col("rank") - F.lit(1.0 / (NB * BS)))).alias("d")).first()["d"]
    assert dev < 1e-9, dev
    ranks.unpersist()
    times.append(round(dt, 3))
    print(f"rep{i}: {dt:.3f}s  pinned_rdds={len(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())}", flush=True)
    spark.sparkContext._jvm.System.gc()

print(f"SOLO {root} reps={times}", flush=True)
