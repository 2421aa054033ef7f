"""Instrumented repro of the leiden sf0.1 slowdown (level-1 local moves).

Monkeypatches _materialize and count-bearing calls to time every Spark job.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import traceback

from echo_chambers_detection_spark.session import get_spark
from echo_chambers_detection_spark.operators import graph as G

orig_materialize = G._materialize


def timed_materialize(df):
    t0 = time.time()
    out = orig_materialize(df)
    dt = time.time() - t0
    caller = traceback.extract_stack()[-3]
    print(f"  materialize {dt:6.1f}s  {caller.name}:{caller.lineno} parts={out.rdd.getNumPartitions()}", flush=True)
    return out


G._materialize = timed_materialize

orig_lm = G._local_moves
orig_refine = G._refine
orig_coarsen = G._coarsen


def timed_lm(*a, **kw):
    t0 = time.time()
    out = orig_lm(*a, **kw)
    print(f"local_moves total {time.time()-t0:.1f}s moves={out[1]}", flush=True)
    return out


def timed_refine(*a, **kw):
    t0 = time.time()
    out = orig_refine(*a, **kw)
    print(f"refine total {time.time()-t0:.1f}s", flush=True)
    return out


def timed_coarsen(*a, **kw):
    t0 = time.time()
    out = orig_coarsen(*a, **kw)
    print(f"coarsen returned (lazy) {time.time()-t0:.1f}s", flush=True)
    return out


G._local_moves = timed_lm
G._refine = timed_refine
G._coarsen = timed_coarsen


def main() -> None:
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    from echo_chambers_detection_spark.catalog import _post_graph

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    edges = _post_graph(spark, sf_dir).localCheckpoint(eager=True)
    print(f"edges={edges.count()}", flush=True)
    t0 = time.time()
    out = G.leiden(edges, max_levels=2, max_rounds=4)
    n = out.count()
    print(f"leiden total {time.time()-t0:.1f}s rows={n}", flush=True)


if __name__ == "__main__":
    main()
