"""echo_chambers_detection_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference system mnek1t/Echo-Chambers-Detection (a
polyglot Kafka + Neo4j/GDS + Qdrant + Postgres + pandas/NetworkX pipeline
for echo-chamber detection over Bluesky data).

One engine replaces the reference's constellation:

- DataFrame/SQL (Catalyst) for relational, temporal (SCD-2) and vector math
- iterative DataFrame joins for the graph algorithms (k-core, label
  propagation, Louvain-family, FastRP)
- Structured Streaming for ingest
- Pandas UDFs only where built-ins genuinely can't express the semantics
  (model inference, HDBSCAN-style density clustering)

Layout:
    sources/    loaders for parquet test tables + domain views
    functions/  column-level expressions (vector math, cleaning, text)
    operators/  DataFrame->DataFrame operators (co-engagement, metrics,
                graph algorithms, ANN, dedup, SCD-2, multimodal)
    plans/      plan-inspection helpers (pushdown/codegen assertions)
    streaming/  structured-streaming ingest pipelines
"""

from echo_chambers_detection_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
