"""Louvain-only probe: fresh JVM, 3 in-process reps + job count.
Usage: python scripts/louvain_solo.py <package_root>
"""

from __future__ import annotations

import sys
import time

root = sys.argv[1]
sys.path.insert(0, root)

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[32]")
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

assert G.__file__.startswith(root)
NB, BS = 50, 2000
e25 = planted_partition_edges(spark, NB, BS, 25, bridges=True, partitions=64)
times = []
for i in range(3):
    j0 = len(spark.sparkContext.statusTracker().getJobIdsForGroup(None))
    t0 = time.perf_counter()
    out = G.louvain(e25, max_levels=2, max_rounds=4).localCheckpoint(eager=True)
    dt = time.perf_counter() - t0
    out.unpersist()
    j1 = len(spark.sparkContext.statusTracker().getJobIdsForGroup(None))
    times.append(round(dt, 1))
    print(f"rep{i}: {dt:.1f}s jobs={j1-j0}", flush=True)
    spark.sparkContext._jvm.System.gc()
print(f"LOUVAIN {root} reps={times}", flush=True)
