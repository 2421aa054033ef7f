"""Per-phase JOB counts for one leiden run (host-noise-immune)."""

from __future__ import annotations

import sys
import time
from collections import defaultdict

sys.path.insert(0, "/root/repo")

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

jobs_acc = defaultdict(int)
time_acc = defaultdict(float)
calls = defaultdict(int)


def njobs():
    return len(spark.sparkContext.statusTracker().getJobIdsForGroup(None))


def timed(name, fn):
    def wrap(*a, **k):
        j0, t0 = njobs(), time.perf_counter()
        try:
            return fn(*a, **k)
        finally:
            jobs_acc[name] += njobs() - j0
            time_acc[name] += time.perf_counter() - t0
            calls[name] += 1
    return wrap


G._local_moves = timed("local_moves", G._local_moves)
G._refine = timed("refine", G._refine)
G._coarsen = timed("coarsen", G._coarsen)
G.connected_components = timed("cc", G.connected_components)

NB, BS = 50, 2000
e31 = planted_partition_edges(spark, NB, BS, 31, bridges=True, partitions=64)
j0, t0 = njobs(), time.perf_counter()
out = G.leiden(e31, max_levels=2, max_rounds=4).localCheckpoint(eager=True)
total_j, total_t = njobs() - j0, time.perf_counter() - t0
out.unpersist()
print(f"leiden: jobs={total_j} wall={total_t:.1f}s")
for k in sorted(jobs_acc, key=lambda k: -jobs_acc[k]):
    print(f"  {k:12s} jobs={jobs_acc[k]:4d} wall={time_acc[k]:6.1f}s calls={calls[k]}")
print(f"  {'other':12s} jobs={total_j - sum(jobs_acc.values()):4d} "
      f"wall={total_t - sum(time_acc.values()):6.1f}s")
