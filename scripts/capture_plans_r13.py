"""Capture .explain('formatted') for catalog queries into plans/r12/.

Usage: python scripts/capture_plans.py <suffix> <name> [<name> ...]

Writes plans/r12/<name>_<suffix>.txt for each query (suffix = before /
after). Uses the engine session factory, sf0.1 inputs. NOTE: building a
catalog query's DataFrame can itself execute gate probes eagerly (the
traversal/coengagement gates) — the dump is the plan of the RETURNED
frame, which for mirror-served queries is the local-relation plan; that
is the honest plan of what runs, and the gate's probe cost is part of
the operator's measured wall time, not of this dump.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from echo_chambers_detection_spark.catalog import QUERY_REGISTRY
from echo_chambers_detection_spark.session import get_spark

suffix = sys.argv[1]
names = sys.argv[2:]
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
out_dir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("SPARK_GRAFT_PLANS_DIR", "r13"),
)
os.makedirs(out_dir, exist_ok=True)

spark = get_spark(app_name="capture-plans")
for name in names:
    spec = QUERY_REGISTRY[name]
    df = spec.spark(spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    path = os.path.join(out_dir, f"{name}_{suffix}.txt")
    with open(path, "w") as fh:
        fh.write(plan)
    print(f"wrote {path} ({len(plan)} chars)", flush=True)
spark.stop()
