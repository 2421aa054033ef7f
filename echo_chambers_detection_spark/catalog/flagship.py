"""Flagship: co-engagement projection (SURVEY.md J3/G1/A1).

Split from the single-file catalog (round 7, VERDICT r6 #7); bodies
are verbatim from that file — see its git history for provenance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from echo_chambers_detection_spark.operators.coengagement import coengagement_edges
from echo_chambers_detection_spark.sources.domain import (
    engagements_from_events,
    users_from_events,
)

from echo_chambers_detection_spark.catalog._core import (
    _t,
    register,
)

# ===========================================================================
# Flagship: co-engagement projection (SURVEY.md J3/G1/A1)
# ===========================================================================

# Shared derivation: events -> engagements (user_did, post_uri via props.k)
_ORACLE_ENGAGEMENTS_CTE = """
e AS (
    SELECT DISTINCT CAST(user_id AS VARCHAR) AS user_did,
           json_extract_string(props, '$.k') AS post_uri
    FROM events
    WHERE json_extract_string(props, '$.k') IS NOT NULL
)
"""


@register(
    "coengagement_edges",
    f"""
WITH {_ORACLE_ENGAGEMENTS_CTE}
SELECT a.user_did AS u1, b.user_did AS u2, COUNT(*) AS weight
FROM e a JOIN e b ON a.post_uri = b.post_uri AND a.user_did < b.user_did
GROUP BY 1, 2
""",
    doc="Weighted undirected co-engagement graph projection "
    "(reference project/metrics/community_detection.py:22-38)",
)
def q_coengagement_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from echo_chambers_detection_spark.operators.graph import (
        carry_ckpt,
        tracked_checkpoint,
    )

    # Checkpoint the parsed engagement relation: the general self-join
    # reads it twice, and the user-encode auto-probe + dictionary build
    # (operators/coengagement.py) add two more passes — JSON extraction
    # over the events scan is the expensive part to repeat.
    eng = tracked_checkpoint(
        engagements_from_events(_t(spark, sf_dir, "events"))
    )
    return carry_ckpt(coengagement_edges(eng), eng)


@register(
    "coengagement_top_pairs",
    f"""
WITH {_ORACLE_ENGAGEMENTS_CTE},
w AS (
    SELECT a.user_did AS u1, b.user_did AS u2, COUNT(*) AS weight
    FROM e a JOIN e b ON a.post_uri = b.post_uri AND a.user_did < b.user_did
    GROUP BY 1, 2
)
SELECT u1, u2, weight FROM w
ORDER BY weight DESC, u1, u2 LIMIT 20
""",
    doc="Top-k strongest co-engagement pairs (TakeOrderedAndProject; "
    "SURVEY.md T1/T3). Same logical query as coengagement_edges but "
    "executed via the bitmap physical strategy — the engine's cost-based "
    "alternative when the item vocabulary is bounded (both plans are "
    "oracle-verified against the same SQL).",
)
def q_coengagement_top_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from echo_chambers_detection_spark.operators.coengagement import (
        coengagement_edges_bitmap,
    )

    from echo_chambers_detection_spark.operators.graph import (
        carry_ckpt,
        tracked_checkpoint,
    )

    eng = tracked_checkpoint(
        engagements_from_events(_t(spark, sf_dir, "events"))
    )
    return carry_ckpt(
        coengagement_edges_bitmap(eng, num_slots=None)
        .orderBy(F.desc("weight"), "u1", "u2")
        .limit(20),
        eng,
    )


