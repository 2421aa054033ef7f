"""In-session degradation probe: does a big-shuffle 'storm' inflate a
subsequent small pair-explosion query inside ONE session (the full-bench
symptom: ngram_jaccard_pairs 2.7s fresh vs 39s mid-catalog)?

Usage: python /tmp/storm_probe.py <label> [shm]
With 'shm', spark.local.dir is pointed at /dev/shm/spark_local.
"""
import json
import os
import shutil
import subprocess
import sys
import time

label = sys.argv[1]
use_shm = len(sys.argv) > 2 and sys.argv[2] == "shm"

sys.path.insert(0, "/root/repo")
from echo_chambers_detection_spark.catalog import QUERY_REGISTRY
from echo_chambers_detection_spark.session import get_spark

extra = {}
if use_shm:
    os.makedirs("/dev/shm/spark_local", exist_ok=True)
    extra["spark.local.dir"] = "/dev/shm/spark_local"

spark = get_spark(app_name=f"storm_{label}", extra_conf=extra)
SF = "/root/testdata/sf0.1"


def release():
    spark.sparkContext.cancelAllJobs()
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    had = jmap.size() > 0
    for rdd in jmap.values():
        rdd.unpersist()
    spark.catalog.clearCache()
    release.calls = getattr(release, "calls", 0) + 1
    if had or release.calls % 4 == 0:
        spark.sparkContext._jvm.System.gc()


def run(q, tag):
    t0 = time.perf_counter()
    QUERY_REGISTRY[q].spark(spark, SF).write.format("noop").mode(
        "overwrite"
    ).save()
    dt = round(time.perf_counter() - t0, 3)
    # local-dir footprint after the query
    du = subprocess.run(
        ["du", "-sm"] + [
            d for pat in ("/tmp", "/dev/shm/spark_local")
            for d in __import__("glob").glob(pat + "/blockmgr-*")
        ],
        capture_output=True, text=True,
    ).stdout.strip().replace("\n", " ")
    print(json.dumps({"label": label, "tag": tag, "q": q, "s": dt,
                      "blockmgr_mb": du}), flush=True)
    release()


PROBES = ["ngram_jaccard_pairs", "shingle_containment_pairs"]
STORM = [
    "coengagement_edges", "weighted_random_walks", "density_clusters",
    "kcore_user_graph", "coengagement_weekly_snapshots",
    "seeded_random_walks", "walk_skipgram_pairs", "benchmark_contamination",
    "user_jaccard_similarity", "minhash_jaccard_estimate_error",
    "density_clusters_lsh_exhaustive", "triangle_counts",
]

# warm the probe shapes
for q in PROBES:
    QUERY_REGISTRY[q].spark(spark, "/root/testdata/sf0.001").write.format(
        "noop"
    ).mode("overwrite").save()
release()

for rep in range(3):
    for q in PROBES:
        run(q, f"pre{rep}")
for rep in range(2):
    for q in STORM:
        run(q, f"storm{rep}")
for rep in range(3):
    for q in PROBES:
        run(q, f"post{rep}")
spark.stop()
