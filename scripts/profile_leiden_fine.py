"""Line-attributed accounting of leiden()'s 'other' time: wraps
_materialize/_materialize_wide/toPandas/count/isEmpty/first with
caller-line attribution. Solo-run; compare splits, not seconds."""

from __future__ import annotations

import sys
import time
import traceback
from collections import defaultdict

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, SparkSession

spark = (
    SparkSession.builder.master("local[32]")
    .appName("leiden-fine")
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

acc = defaultdict(float)


def attributed(fn, label):
    def wrap(*a, **k):
        t0 = time.perf_counter()
        try:
            return fn(*a, **k)
        finally:
            fr = next(
                (f for f in reversed(traceback.extract_stack())
                 if "operators/graph.py" in f.filename
                 or "operators/localgraph.py" in f.filename),
                None,
            )
            where = f"{label}@{fr.lineno if fr else '?'}"
            acc[where] += time.perf_counter() - t0
    return wrap


G._materialize = attributed(G._materialize, "mat")
G._materialize_wide = attributed(G._materialize_wide, "matw")
for m in ("toPandas", "count", "isEmpty", "first"):
    setattr(DataFrame, m, attributed(getattr(DataFrame, m), m))

NB, BS = 50, 2000
edges = planted_partition_edges(spark, NB, BS, 31, bridges=True, partitions=64)
t0 = time.perf_counter()
out = G.leiden(edges, max_levels=2, max_rounds=4).localCheckpoint(eager=True)
total = time.perf_counter() - t0
out.unpersist()
print(f"leiden total: {total:.1f}s")
for k in sorted(acc, key=lambda k: -acc[k]):
    if acc[k] >= 0.2:
        print(f"  {k:18s} {acc[k]:7.2f}s")
print(f"  attributed sum: {sum(acc.values()):.1f}s")
