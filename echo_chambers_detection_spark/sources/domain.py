"""Domain views: the reference's entity tables derived from driver testdata.

The reference's data model (SURVEY.md §1, FIXTURES.md) is
users / posts / engagements / post_embeddings. The driver testdata stands
in for the crawl:

  events      -> engagements: user_id is the user, props.k is the shared
                 item ("post"), event_type is the engagement kind.
  events      -> users: distinct user_ids with synthesized handles.
  documents   -> posts: doc_id is uri and cid, text is text.
  embeddings  -> post_embeddings: vec_id as post_cid, embedding as vector.

All derivations are pure column expressions — each stays a single scan
with pushdown intact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from echo_chambers_detection_spark.functions.cleaning import clean_unknown


def engagements_from_events(events: DataFrame) -> DataFrame:
    """events -> engagements(user_did, post_uri, kind).

    Mirrors the reference's engagement edges ((:User)-[:LIKED|POSTED]->(:Post),
    reference project/neo4j/consumer_user.py:55-63). `props` is a JSON string;
    we parse the single key with get_json_object (F1) — JVM-side, no UDF.
    """
    return events.select(
        F.col("user_id").cast("string").alias("user_did"),
        F.get_json_object(F.col("props"), "$.k").alias("post_uri"),
        F.col("event_type").alias("kind"),
    ).where(F.col("post_uri").isNotNull())


def users_from_events(events: DataFrame) -> DataFrame:
    """events -> users(did, handle, display_name).

    The reference coalesces missing/empty profile fields to 'unknown'
    (project/neo4j/consumer_user.py:39-41); synthesized handles here are
    never null but the cleaning expr is applied for parity.
    """
    return (
        events.select(F.col("user_id").cast("string").alias("did"))
        .distinct()
        .select(
            "did",
            clean_unknown(F.concat(F.lit("user-"), F.col("did"))).alias("handle"),
            clean_unknown(F.concat(F.lit("User "), F.col("did"))).alias("display_name"),
        )
    )


def posts_from_documents(documents: DataFrame) -> DataFrame:
    """documents -> posts(uri, cid, text, author_did).

    uri is the graph-side key, cid the embedding-side key — the reference
    keeps BOTH because its Qdrant payload joins on cid while Neo4j joins on
    uri (SURVEY.md §1.3 wrinkle; project/metrics/metrics_interface.py:62-68).
    Author assignment is deterministic (hash of doc_id)."""
    return documents.select(
        F.concat(F.lit("at://post/"), F.col("doc_id").cast("string")).alias("uri"),
        F.col("doc_id").cast("string").alias("cid"),
        F.col("text"),
        (F.pmod(F.xxhash64(F.col("doc_id")), F.lit(1000))).cast("string").alias("author_did"),
    )


def post_embeddings(embeddings: DataFrame) -> DataFrame:
    """embeddings -> post_embeddings(post_cid, vector, label).

    Maps the driver fixture (vec_id, embedding list<float>, label) onto the
    reference's Qdrant point shape {id, vector, payload} (SURVEY.md §1.3).
    `label` is kept: FIXTURES.md uses it as the fixed community-label
    column, decoupling metric correctness from algorithm nondeterminism."""
    return embeddings.select(
        F.col("vec_id").cast("string").alias("post_cid"),
        F.col("embedding").alias("vector"),
        F.col("label"),
    )
