"""Explicit schemas for every table the engine touches.

The reference has five coexisting schema disciplines (implicit Kafka JSON,
Neo4j labels-by-MERGE, Qdrant fixed-vector+free-payload, Postgres DDL,
pandas inference — SURVEY.md §1.6). The engine collapses all of them into
explicit StructTypes: schema-on-write everywhere, `from_json` with an
explicit StructType at the stream boundary (never schema inference on a
100 TB scan).

Domain tables mirror the reference's entities:
  users        <- Neo4j :User nodes        (reference project/neo4j/consumer_user.py:43-53)
  posts        <- Neo4j :Post nodes        (reference project/neo4j/consumer_post.py:34-43)
  engagements  <- LIKED + POSTED edges     (reference project/neo4j/consumer_user.py:55-63,
                                            project/neo4j/consumer_post.py:40-42)
  post_embeddings <- Qdrant points         (reference project/qdrant/consumer_post.py:94-106)
plus the Postgres run-catalog tables (reference project/postgres/postgres-schema.sql:9-48).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Domain entities (reference data model, SURVEY.md §1.2-1.4)
# ---------------------------------------------------------------------------

USERS = T.StructType(
    [
        T.StructField("did", T.StringType(), False),
        T.StructField("handle", T.StringType(), True),
        T.StructField("display_name", T.StringType(), True),
    ]
)

POSTS = T.StructType(
    [
        T.StructField("uri", T.StringType(), False),
        T.StructField("cid", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("author_did", T.StringType(), True),
    ]
)

# kind in {'LIKED', 'POSTED'} — the union the reference expresses as the
# Cypher alternation [:LIKED|POSTED] (project/metrics/community_detection.py:24).
ENGAGEMENTS = T.StructType(
    [
        T.StructField("user_did", T.StringType(), False),
        T.StructField("post_uri", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
    ]
)

POST_EMBEDDINGS = T.StructType(
    [
        T.StructField("post_cid", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("vector", T.ArrayType(T.FloatType()), False),
    ]
)

# Run catalog (Postgres schema, reference project/postgres/postgres-schema.sql)
ALGORITHM = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("name", T.StringType(), False),
    ]
)

CLUSTERING_RUN = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("algorithm_id", T.StringType(), False),
        T.StructField("created_at", T.TimestampType(), False),
        T.StructField("description", T.StringType(), True),
    ]
)

COMMUNITY = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("run_id", T.StringType(), False),
        T.StructField("label", T.IntegerType(), False),
        T.StructField("total_amount", T.IntegerType(), True),
    ]
)

COMMUNITY_MEMBERSHIP = T.StructType(
    [
        T.StructField("community_id", T.StringType(), False),
        T.StructField("node_id", T.StringType(), False),
        T.StructField("valid_from", T.TimestampType(), False),
        T.StructField("valid_to", T.TimestampType(), True),
    ]
)

COMMUNITY_METRICS = T.StructType(
    [
        T.StructField("community_id", T.StringType(), False),
        T.StructField("homophily", T.DoubleType(), True),
        T.StructField("cohesion", T.DoubleType(), True),
        T.StructField("separation", T.DoubleType(), True),
        T.StructField("ecs", T.DoubleType(), True),
        T.StructField("variance", T.DoubleType(), True),
        T.StructField("conductance", T.DoubleType(), True),
        T.StructField("density_internal", T.DoubleType(), True),
        T.StructField("internal_edge_count", T.IntegerType(), True),
        T.StructField("subgraph_size", T.IntegerType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Stream message shapes (Kafka JSON, SURVEY.md §1.1) — for from_json
# ---------------------------------------------------------------------------

# users topic multiplexes two shapes discriminated by `type`
# (reference project/neo4j/consumer_user.py:79-82); one superset schema,
# the fork is a filter.
USER_TOPIC_MESSAGE = T.StructType(
    [
        T.StructField("type", T.StringType(), True),
        T.StructField("did", T.StringType(), True),
        T.StructField("handle", T.StringType(), True),
        T.StructField("display_name", T.StringType(), True),
        T.StructField("description", T.StringType(), True),
        T.StructField("user_did", T.StringType(), True),
        T.StructField("uri", T.StringType(), True),
    ]
)

POST_TOPIC_MESSAGE = T.StructType(
    [
        T.StructField("uri", T.StringType(), True),
        T.StructField("cid", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("author", T.StringType(), True),
    ]
)

# events test-table props column (driver fixture)
EVENT_PROPS = T.StructType([T.StructField("k", T.LongType(), True)])

# Names of the driver-provided parquet test tables.
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
