"""Parquet loaders for the driver test tables.

The reference's many read paths (Qdrant scroll pagination, Neo4j Cypher
reads, Postgres selects, pd.read_csv — SURVEY.md §2.1 S10-S18) all become
one thing here: a parquet scan that Catalyst can push filters and column
pruning into. Pagination is a non-concept.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from echo_chambers_detection_spark.schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    """Load one test table by name from a scale-factor directory.

    Timestamp tolerance: older fixture generations wrote `events.ts` as
    TIMESTAMP(NANOS), which Spark 4 rejects by default — we read
    nanos-as-long (runtime conf, set here so it also applies under a
    driver-owned session) and rebuild a TimestampType column with integer
    division (ns epoch values ~1.7e18 overflow double precision, so `div`,
    never `/`). Current generations write native TIMESTAMP(MICROS), which
    Spark reads as TIMESTAMP_NTZ; we cast to TIMESTAMP (LTZ) because the
    engine's event-time surface (unix_millis, watermarks, streaming
    schemas) is typed on TIMESTAMP. The session timezone is pinned to UTC
    (session.py), so the NTZ->LTZ cast is value-identity and epoch_ms in
    a DuckDB oracle over the same file sees the same instant.
    """
    sf_dir = sf_dir or DEFAULT_SF_DIR
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str | None = None) -> dict[str, DataFrame]:
    """Load every test table; also registers each as a temp view so that
    `spark.sql` works against the same names the DuckDB oracle uses."""
    out: dict[str, DataFrame] = {}
    for name in TESTDATA_TABLES:
        df = load_table(spark, name, sf_dir)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def write_csv(df: DataFrame, path: str) -> None:
    """CSV sink, mirroring the reference's `{algo}_clusters.csv` artifacts
    (reference /louvain_clusters.csv et al., SURVEY.md S19)."""
    df.write.mode("overwrite").option("header", "true").csv(path)


def read_csv(spark: SparkSession, path: str, schema) -> DataFrame:
    """CSV source with explicit schema (reference pd.read_csv of cluster
    files, project/metrics/metrics_interface.py:47-50, SURVEY.md S18)."""
    return spark.read.option("header", "true").schema(schema).csv(path)


def write_jsonl(df: DataFrame, path: str) -> None:
    """JSON-lines sink — the interchange format training-data pipelines
    feed tokenizers with (one JSON document per line; Spark's json
    writer is newline-delimited by construction). Engine infrastructure
    beyond the reference's CSV artifacts."""
    df.write.mode("overwrite").json(path)


def read_jsonl(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """JSON-lines source. Pass an explicit schema in production —
    schema inference is a full extra pass over the data, which at
    100 TB doubles the scan cost."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.json(path)


def write_orc(df: DataFrame, path: str) -> None:
    """ORC sink — the other columnar format Spark ships a native
    vectorized reader for; kept API-symmetric with parquet so tables
    can migrate either way."""
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)
