"""Interleaved A/B probe: times the regressed bench rows + a set of
catalog rows in whichever tree PYTHONPATH points at. GC mode flag
replicates bench.py's release_persisted variants:
  always  - System.gc() after every timed query (r11 behavior)
  cond    - only when persisted blocks were left, or every 4th (r12)
  never   - no forced GC
Usage: python /tmp/ab_probe.py <label> <gcmode> [reps]
Prints one JSON line {"label":..., "gc":..., "timings": {...}}
"""
import json
import os
import sys
import time

label, gcmode = sys.argv[1], sys.argv[2]
reps = int(sys.argv[3]) if len(sys.argv) > 3 else 1

from echo_chambers_detection_spark.catalog import QUERY_REGISTRY
from echo_chambers_detection_spark.session import get_spark
from echo_chambers_detection_spark.operators import graph as G
from echo_chambers_detection_spark.operators.planted import (
    planted_partition_edges,
)
from echo_chambers_detection_spark.operators.triangles import triangle_counts

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARM_DIR = "/root/testdata/sf0.001"

spark = get_spark(app_name=f"ab_{label}")
calls = [0]


def release():
    spark.sparkContext.cancelAllJobs()
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    had = jmap.size() > 0
    for rdd in jmap.values():
        rdd.unpersist()
    spark.catalog.clearCache()
    calls[0] += 1
    if gcmode == "always" or (
        gcmode == "cond" and (had or calls[0] % 4 == 0)
    ):
        spark.sparkContext._jvm.System.gc()


CATALOG_ROWS = [
    "exact_dedup_groups",
    "ngram_jaccard_pairs",
    "minhash_lsh_candidates",
    "pricing_summary",
    "coengagement_top_pairs",
    "shingle_containment_pairs",
    "semantic_dedup_md5_keep",
    "density_clusters_lsh_exhaustive",
    "weighted_random_walks",
    "c4_quality_flags",
    "multimodal_blob_stats",
    "kcore_user_graph",
]

# warm-up: same shapes at sf0.001 (JIT/codegen), mirroring bench.py
for q in CATALOG_ROWS:
    if q in QUERY_REGISTRY and os.path.isdir(WARM_DIR):
        QUERY_REGISTRY[q].spark(spark, WARM_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
release()

timings = {}

NB, BS = 50, 2000


def e25():
    return planted_partition_edges(
        spark, NB, BS, 25, bridges=False, partitions=64
    )


def run_probe(key, fn):
    t0 = time.perf_counter()
    out = fn()
    out.write.format("noop").mode("overwrite").save()
    dt = round(time.perf_counter() - t0, 3)
    timings.setdefault(key, []).append(dt)
    # crash-robust incremental record
    print(json.dumps({"label": label, "gc": gcmode, "row": key, "s": dt}),
          flush=True)
    release()


from pyspark.sql import functions as F  # noqa: E402

for rep in range(reps):
    # catalog rows
    for q in CATALOG_ROWS:
        if q not in QUERY_REGISTRY:
            continue
        t0 = time.perf_counter()
        QUERY_REGISTRY[q].spark(spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = round(time.perf_counter() - t0, 3)
        timings.setdefault(q, []).append(dt)
        print(json.dumps({"label": label, "gc": gcmode, "row": q, "s": dt}),
              flush=True)
        release()

    # scale probes (mirror bench.py shapes; fixture built per call like
    # the bench does for these rows)
    run_probe("lpa_5m", lambda: G.label_propagation(e25().select("u1", "u2")))
    run_probe(
        "pagerank_5m",
        lambda: G.pagerank(e25().select("u1", "u2"), max_iter=5, tol=0.0),
    )
    run_probe(
        "cc_5m",
        lambda: G.connected_components(e25().select("u1", "u2"), max_iter=80),
    )
    saved = G.LOCAL_TRAVERSAL_EDGE_LIMIT
    G.LOCAL_TRAVERSAL_EDGE_LIMIT = 0
    try:
        run_probe(
            "triangles_2m5",
            lambda: triangle_counts(
                planted_partition_edges(
                    spark, NB, BS, 25, bridges=False, partitions=64,
                    offsets="linear",
                ).select("u1", "u2")
            ),
        )
    finally:
        G.LOCAL_TRAVERSAL_EDGE_LIMIT = saved

    # paired community probes on the d=31 fixture (bench.py shape);
    # fixture rebuilt per probe since release() sweeps all persisted
    # blocks after each timed row
    for pname, palgo in (
        ("louvain_d31", lambda e: G.louvain(e, max_levels=2, max_rounds=4)),
        ("leiden_d31", lambda e: G.leiden(e, max_levels=2, max_rounds=4)),
    ):
        e_lei = planted_partition_edges(
            spark, NB, BS, 31, bridges=True, partitions=64
        ).localCheckpoint(eager=True)
        run_probe(pname, lambda: palgo(e_lei))

print(json.dumps({"label": label, "gc": gcmode, "timings": timings}))
spark.stop()
