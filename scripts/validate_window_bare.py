"""Pre-validate the driver stamp window on a BARE session.

Emulates the correctness driver: a SparkSession with NO engine confs
beyond master/shuffle-partitions (so nothing in the catalog silently
depends on session.get_spark's tuning), the FIRST 50 registry entries
at sf0.01, each compared to its DuckDB oracle with the canonicalized
exact-equality replica from tests/oracle_utils.py. Prints one line per
query and a final tally; exits non-zero on any mismatch."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"),
)

from pyspark.sql import SparkSession

from echo_chambers_detection_spark.catalog import QUERY_REGISTRY
from oracle_utils import _canonicalize, duckdb_con

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
N = int(os.environ.get("WINDOW_N", "50"))


def main() -> int:
    spark = (
        SparkSession.builder.master("local[*]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .appName("window-validate")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb_con(SF_DIR)
    bad = 0
    for i, (name, spec) in enumerate(QUERY_REGISTRY.items()):
        if i >= N:
            break
        t0 = time.perf_counter()
        try:
            got = _canonicalize(spec.spark(spark, SF_DIR).toPandas())
            if spec.oracle is None:
                status = f"rows-only ({len(got)} rows)"
            else:
                want = _canonicalize(con.sql(spec.oracle).df())
                if got.equals(want):
                    status = f"OK ({len(got)} rows)"
                else:
                    status = (
                        f"MISMATCH spark={len(got)} oracle={len(want)}"
                    )
                    bad += 1
        except Exception as exc:  # noqa: BLE001 — report and continue
            status = f"ERROR {type(exc).__name__}: {exc}"
            bad += 1
        print(
            f"[{i + 1:02d}/{N}] {name:40s} {status} "
            f"({time.perf_counter() - t0:.1f}s)",
            flush=True,
        )
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist()
    print(f"window validation: {N - bad}/{N} green")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
