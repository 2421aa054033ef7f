"""Driver-side (no-Spark-job) serving entry points.

Spark is a batch engine; a standing vector-search deployment answers
single queries in milliseconds from a resident index (the reference's
Qdrant collection, project/qdrant/consumer_post.py:42-49). This package
closes that seam for the IVF index the batch side already persists:
`IvfProbe.probe_one` loads the parquet index once per process and
answers point queries with pure numpy — no Spark session required.
"""

from echo_chambers_detection_spark.serving.ivf_probe import IvfProbe

__all__ = ["IvfProbe"]
