"""Phase-level wall-clock accounting for leiden() at the bench fixture
(d=31 planted partition, 6.2M directed rows) — VERDICT r8 #4.

Monkeypatches timers around _local_moves / _refine / _coarsen /
connected_components and prints the per-phase split, plus a Louvain run
for the ratio. Solo-run numbers: compare SPLITS, not absolute seconds
(shared host)."""

from __future__ import annotations

import time
from collections import defaultdict

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[32]")
    .appName("leiden-profile")
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
calls = defaultdict(int)


def timed(name, fn):
    def wrap(*a, **k):
        t0 = time.perf_counter()
        try:
            return fn(*a, **k)
        finally:
            acc[name] += time.perf_counter() - t0
            calls[name] += 1
    return wrap


G._local_moves = timed("local_moves", G._local_moves)
G._refine = timed("refine", G._refine)
G._coarsen = timed("coarsen", G._coarsen)
G.connected_components = timed("cc", G.connected_components)

NB, BS = 50, 2000
edges = planted_partition_edges(spark, NB, BS, 31, bridges=True, partitions=64)

t0 = time.perf_counter()
out = G.leiden(edges, max_levels=2, max_rounds=4).localCheckpoint(eager=True)
total = time.perf_counter() - t0
out.unpersist()
print(f"leiden total: {total:.1f}s")
for k in sorted(acc, key=lambda k: -acc[k]):
    print(f"  {k:12s} {acc[k]:7.1f}s  ({calls[k]} calls, {100*acc[k]/total:.0f}%)")
other = total - sum(acc.values())
print(f"  {'other':12s} {other:7.1f}s  ({100*other/total:.0f}%)")

acc.clear(); calls.clear()
edges_b = planted_partition_edges(spark, NB, BS, 25, bridges=True, partitions=64)
t0 = time.perf_counter()
out = G.louvain(edges_b, max_levels=2, max_rounds=4).localCheckpoint(eager=True)
lt = time.perf_counter() - t0
out.unpersist()
print(f"louvain total: {lt:.1f}s (d=25 fixture, the bench row)")
for k in sorted(acc, key=lambda k: -acc[k]):
    print(f"  {k:12s} {acc[k]:7.1f}s  ({calls[k]} calls)")
print(f"ratio leiden/louvain: {total/lt:.2f} (raw; bench edge counts differ 6.2M vs 5M)")
