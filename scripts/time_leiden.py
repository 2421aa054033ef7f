"""Clean standalone timing of the leiden_communities catalog query at sf0.1.

Run solo (no concurrent Spark jobs) — contended runs produce absurd
outliers (see memory: bench noise).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from echo_chambers_detection_spark.session import get_spark
from echo_chambers_detection_spark.catalog import QUERY_REGISTRY

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    for name in sys.argv[1:] or ["leiden_communities"]:
        fn = QUERY_REGISTRY[name].spark
        t0 = time.time()
        n = fn(spark, SF_DIR).count()
        print(f"{name}: {time.time() - t0:.1f}s rows={n}", flush=True)


if __name__ == "__main__":
    main()
