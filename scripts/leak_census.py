"""Per-query checkpoint-leak census (COVERAGE.md methodology).

For every catalog query at sf0.001: snapshot the pinned-RDD set, run the
query, materialize it like a caller would (count), release it via
_release_checkpoint, and diff the pinned set. Any surviving block is a
caller-visible leak — a long-lived session NOT using bench.py's
between-query sweep would accumulate it. Leaked blocks are force-swept
between queries so one leaker can't confound the next row.

Usage: python scripts/leak_census.py [only_prefix...]
Prints one line per leaking query and a final summary line.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def pinned(spark):
    return {
        int(i)
        for i in spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
    }


def sweep(spark, ids):
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for i in ids:
        jrdd = jmap.get(i)
        if jrdd is not None:
            jrdd.unpersist(False)


def main() -> int:
    only = sys.argv[1:]
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]"
        )
        .appName("leak-census")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "12g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from echo_chambers_detection_spark.catalog import QUERY_REGISTRY
    from echo_chambers_detection_spark.operators.graph import (
        _release_checkpoint,
    )

    leakers = {}
    total = 0
    for name, spec in QUERY_REGISTRY.items():
        if only and not any(name.startswith(p) for p in only):
            continue
        total += 1
        base = pinned(spark)
        t0 = time.time()
        try:
            df = spec.spark(spark, SF_DIR)
            df.count()
            _release_checkpoint(df)
        except Exception as e:  # noqa: BLE001
            print(f"ERR {name}: {type(e).__name__}: {e}", flush=True)
            sweep(spark, pinned(spark) - base)
            continue
        leaked = pinned(spark) - base
        if leaked:
            leakers[name] = sorted(leaked)
            print(
                f"LEAK {name}: {len(leaked)} frames {sorted(leaked)} "
                f"({time.time() - t0:.1f}s)",
                flush=True,
            )
        sweep(spark, leaked)
    print(
        f"SUMMARY queries={total} leakers={len(leakers)} "
        f"frames={sum(len(v) for v in leakers.values())}",
        flush=True,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
