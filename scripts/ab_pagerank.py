"""Same-session A/B of bench_pagerank_planted_5m: r7 code vs HEAD.

VERDICT r8 "What's wrong" #3: the row moved 13.06s -> 14.63s on a host
that drift-measured ~16% faster. The only shared-path change r8 made is
the tol=0.0 delta-job skip (which removes work). This probe alternates
the two code versions inside ONE SparkSession (interleaved ABAB so host
drift cancels) and prints per-rep and median timings.
"""

from __future__ import annotations

import importlib
import sys
import time

R7 = "/root/repo/.ab_r7"
HEAD = "/root/repo"


def load_graph(root):
    for m in [k for k in sys.modules if k.startswith("echo_chambers_detection_spark")]:
        del sys.modules[m]
    sys.path = [p for p in sys.path if p not in (R7, HEAD)]
    sys.path.insert(0, root)
    g = importlib.import_module("echo_chambers_detection_spark.operators.graph")
    p = importlib.import_module("echo_chambers_detection_spark.operators.planted")
    assert g.__file__.startswith(root), g.__file__
    return g, p


def main():
    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("ab-pagerank")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .config("spark.cleaner.periodicGC.interval", "45s")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    NB, BS = 50, 2000
    results = {"r7": [], "head": []}

    def probe(tag, root):
        g, p = load_graph(root)
        edges = p.planted_partition_edges(spark, NB, BS, 25, bridges=False, partitions=64)
        t0 = time.perf_counter()
        ranks = g.pagerank(edges.select("u1", "u2"), max_iter=5, tol=0.0).localCheckpoint(eager=True)
        dt = time.perf_counter() - t0
        n = NB * BS
        dev = ranks.agg(F.max(F.abs(F.col("rank") - F.lit(1.0 / n))).alias("d")).first()["d"]
        assert dev < 1e-9, dev
        ranks.unpersist()
        results[tag].append(round(dt, 3))
        print(f"{tag}: {dt:.3f}s", flush=True)
        spark.sparkContext._jvm.System.gc()

    # warmup (codegen/fixture) once per version, not timed into medians
    probe("head", HEAD)
    probe("r7", R7)
    results["head"].clear()
    results["r7"].clear()
    for _ in range(3):
        probe("r7", R7)
        probe("head", HEAD)

    import statistics

    print("r7 reps:", results["r7"], "median", statistics.median(results["r7"]))
    print("head reps:", results["head"], "median", statistics.median(results["head"]))


if __name__ == "__main__":
    main()
