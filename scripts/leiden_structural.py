"""Structural (host-noise-immune) accounting of one leiden run:
job count, stage count, task count, total shuffle read/write bytes.

Usage: python scripts/leiden_structural.py <package_root>
"""

from __future__ import annotations

import sys
import time

root = sys.argv[1]
sys.path.insert(0, root)

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[32]")
    .appName("leiden-structural")
    .config("spark.sql.shuffle.partitions", "64")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.driver.memory", "48g")
    .config("spark.ui.enabled", "false")
    .config("spark.cleaner.periodicGC.interval", "45s")
    .config("spark.appStateStore.asyncTracking.enable", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import echo_chambers_detection_spark.operators.graph as G
from echo_chambers_detection_spark.operators.planted import (
    planted_partition_edges,
)

assert G.__file__.startswith(root)


def snapshot():
    st = spark.sparkContext.statusTracker()
    ids = st.getJobIdsForGroup(None)
    return set(ids)


def delta_metrics(before: set):
    st = spark.sparkContext.statusTracker()
    new_jobs = [j for j in st.getJobIdsForGroup(None) if j not in before]
    stages = tasks = 0
    for j in new_jobs:
        ji = st.getJobInfo(j)
        if ji is None:
            continue
        for sid in ji.stageIds:
            si = st.getStageInfo(sid)
            if si is not None:
                stages += 1
                tasks += si.numTasks
    return len(new_jobs), stages, tasks


def run(tag, fn):
    before = snapshot()
    tt = time.perf_counter()
    out = fn().localCheckpoint(eager=True)
    dt = time.perf_counter() - tt
    out.unpersist()
    jobs, stages, tasks = delta_metrics(before)
    print(
        f"{tag}: jobs={jobs} stages={stages} tasks={tasks} wall={dt:.1f}s",
        flush=True,
    )


NB, BS = 50, 2000
e31 = planted_partition_edges(spark, NB, BS, 31, bridges=True, partitions=64)
e25 = planted_partition_edges(spark, NB, BS, 25, bridges=True, partitions=64)
# warm codegen with a small probe
G.louvain(
    planted_partition_edges(spark, 4, 300, 10, bridges=True, partitions=8),
    max_levels=2, max_rounds=2,
).localCheckpoint(eager=True).unpersist()
run("louvain_5m", lambda: G.louvain(e25, max_levels=2, max_rounds=4))
run("leiden_6m", lambda: G.leiden(e31, max_levels=2, max_rounds=4))
