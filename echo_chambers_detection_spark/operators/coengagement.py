"""Co-engagement graph projection — the flagship operator.

The reference projects a weighted, undirected user-user graph inside Neo4j:

    MATCH (u1:User)-[:LIKED|POSTED]->(p:Post)<-[:LIKED|POSTED]-(u2:User)
    WHERE id(u1) < id(u2)
    WITH u1, u2, count(p) AS weight
    (project/metrics/community_detection.py:22-38; SURVEY.md J3/G1/A1)

Spark-first formulation: a self-join of the engagement relation on the
post key, ordered-pair dedup (u1 < u2), then a group-count. Catalyst plans
a shuffle-hash / sort-merge join partitioned on post_uri — at 100 TB that
is exactly the partitioning you want: each post's engagement list is
co-located, pairs are generated locally, and the only other shuffle is the
final groupBy on (u1, u2), which AQE skew-splits if a celebrity post
produces a hot pair block.

Scale notes:
- Engagements are deduplicated on (user, post) BEFORE the self-join: the
  reference gets this for free from MERGE-by-key idempotency; for us it
  also caps the join fan-out at |users-per-post| choose 2.
- A `max_post_degree` guard (off by default) drops mega-posts: a post
  liked by 10M users generates 5·10¹³ pairs — at 100 TB you cap or salt.
  The reference's crawl bounds (MAX_LIKERS=20) made this impossible to
  hit; we make the guard explicit instead of implicit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def coengagement_edges(
    engagements: DataFrame,
    user_col: str = "user_did",
    post_col: str = "post_uri",
    max_post_degree: int | None = None,
) -> DataFrame:
    """Weighted undirected co-engagement edges (u1 < u2, weight = #shared posts).

    Returns DataFrame[u1: <user type>, u2: <user type>, weight: long].
    """
    e = engagements.select(user_col, post_col).dropDuplicates([user_col, post_col])

    if max_post_degree is not None:
        degrees = e.groupBy(post_col).agg(F.count("*").alias("_deg"))
        e = (
            e.join(degrees.where(F.col("_deg") <= max_post_degree), post_col, "inner")
            .drop("_deg")
        )

    a = e.alias("a")
    b = e.alias("b")
    return (
        a.join(b, F.col(f"a.{post_col}") == F.col(f"b.{post_col}"))
        .where(F.col(f"a.{user_col}") < F.col(f"b.{user_col}"))
        .groupBy(
            F.col(f"a.{user_col}").alias("u1"),
            F.col(f"b.{user_col}").alias("u2"),
        )
        .agg(F.count("*").alias("weight"))
    )


def symmetrize(edges: DataFrame) -> DataFrame:
    """Undirected edge list (u1<u2 canonical form) -> both directions
    (src, dst, weight), for algorithms that iterate over neighbors.
    Mirrors GDS `undirectedRelationshipTypes: ['*']`
    (project/metrics/community_detection.py:33-37)."""
    fwd = edges.select(
        F.col("u1").alias("src"), F.col("u2").alias("dst"), "weight"
    )
    rev = edges.select(
        F.col("u2").alias("src"), F.col("u1").alias("dst"), "weight"
    )
    return fwd.unionByName(rev)
