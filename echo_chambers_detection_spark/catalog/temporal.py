"""SCD-2 temporal membership + run catalog (SURVEY.md M4: W1/W2).

Split from the single-file catalog (round 7, VERDICT r6 #7); bodies
are verbatim from that file — see its git history for provenance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from echo_chambers_detection_spark.catalog._core import (
    _dec_sum,
    _t,
    register,
)

# ===========================================================================
# SCD-2 temporal membership + run catalog (SURVEY.md M4: W1/W2, §1.4)
# ===========================================================================

# World: the events stream is a membership changelog — each event moves its
# user into community props.k at time ts. Timestamps exported as epoch ms
# (exact integers on both engines; ns-vs-us parquet precision cancels
# under floor-to-ms).


def _membership_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        F.col("user_id").cast("string").alias("user_did"),
        F.get_json_object("props", "$.k").alias("community"),
        "ts",
        "event_id",
    ).where(F.col("community").isNotNull())


_ORACLE_CHANGELOG_CTE = """
ch AS (
    SELECT CAST(user_id AS VARCHAR) AS user_did,
           json_extract_string(props, '$.k') AS community,
           ts, event_id
    FROM events
    WHERE json_extract_string(props, '$.k') IS NOT NULL
),
hist AS (
    SELECT user_did, community,
           ts AS valid_from,
           LEAD(ts) OVER (PARTITION BY user_did ORDER BY ts, event_id) AS valid_to
    FROM ch
)
"""


@register(
    "scd2_membership_history",
    f"""
WITH {_ORACLE_CHANGELOG_CTE}
SELECT user_did, community,
       epoch_ms(valid_from) AS valid_from_ms,
       epoch_ms(valid_to) AS valid_to_ms
FROM hist
""",
    doc="Changelog -> SCD-2 validity intervals via one lead() window — the "
    "read-side dual of the reference's expire/append mutation "
    "(project/db/postgres.py:38-47, postgres-schema.sql:42-48; SURVEY.md W1)",
)
def q_scd2_membership_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from echo_chambers_detection_spark.operators.scd2 import scd2_from_changelog

    hist = scd2_from_changelog(
        _membership_changelog(spark, sf_dir),
        key_col="user_did",
        value_col="community",
        ts_col="ts",
        tiebreak_col="event_id",
    )
    return hist.select(
        "user_did",
        "community",
        F.unix_millis("valid_from").alias("valid_from_ms"),
        F.unix_millis("valid_to").alias("valid_to_ms"),
    )


@register(
    "events_in_membership_intervals",
    f"""
WITH {_ORACLE_CHANGELOG_CTE}
SELECT h.user_did, h.community,
       epoch_ms(h.valid_from) AS valid_from_ms,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM hist h
JOIN events e
  ON CAST(e.user_id AS VARCHAR) = h.user_did
 AND e.ts >= h.valid_from
 AND (h.valid_to IS NULL OR e.ts < h.valid_to)
GROUP BY 1, 2, 3
ORDER BY 1, 3
""",
    doc="Bucketized INTERVAL (range) join (operators/rangejoin.py — "
    "the temporal primitive next to the as-of join): every event lands "
    "in the SCD-2 membership validity window containing its own "
    "timestamp, then per-window activity aggregates. The oracle is the "
    "naive BETWEEN inequality join; the Spark plan is the scale shape "
    "— probes keyed to ONE day-bucket each, intervals replicated per "
    "covered bucket, equi-join on (user, bucket) + exact predicate, "
    "never a broadcast-nested-loop. Open-ended current rows are "
    "capped at max(event ts)+1 (lossless). Decimal-exact value sums.",
)
def q_events_in_membership_intervals(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from echo_chambers_detection_spark.operators.rangejoin import (
        interval_join,
    )
    from echo_chambers_detection_spark.operators.scd2 import (
        scd2_from_changelog,
    )

    hist = scd2_from_changelog(
        _membership_changelog(spark, sf_dir),
        key_col="user_did",
        value_col="community",
        ts_col="ts",
        tiebreak_col="event_id",
    ).select(
        "user_did",
        "community",
        F.unix_millis("valid_from").alias("valid_from_ms"),
        F.unix_millis("valid_to").alias("valid_to_ms"),
    )
    probes = _t(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("user_did"),
        F.unix_millis("ts").alias("ts_ms"),
        "value",
    )
    joined = interval_join(
        probes,
        hist,
        probe_ts="ts_ms",
        start_col="valid_from_ms",
        end_col="valid_to_ms",
        key="user_did",
    )
    return (
        joined.groupBy("user_did", "community", "valid_from_ms")
        .agg(
            F.count("*").alias("n_events"),
            _dec_sum("value").alias("sum_value"),
        )
        .orderBy("user_did", "valid_from_ms")
    )


@register(
    "scd2_current_membership",
    f"""
WITH {_ORACLE_CHANGELOG_CTE}
SELECT user_did, community, epoch_ms(valid_from) AS valid_from_ms
FROM hist WHERE valid_to IS NULL
""",
    doc="Current rows: valid_to IS NULL (reference predicate, "
    "project/db/postgres.py:44; SURVEY.md P9)",
)
def q_scd2_current_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    from echo_chambers_detection_spark.operators.scd2 import (
        current_rows,
        scd2_from_changelog,
    )

    hist = scd2_from_changelog(
        _membership_changelog(spark, sf_dir),
        key_col="user_did",
        value_col="community",
        ts_col="ts",
        tiebreak_col="event_id",
    )
    return current_rows(hist).select(
        "user_did", "community", F.unix_millis("valid_from").alias("valid_from_ms")
    )


@register(
    "scd2_membership_as_of",
    f"""
WITH {_ORACLE_CHANGELOG_CTE}
SELECT user_did, community, epoch_ms(valid_from) AS valid_from_ms
FROM hist
WHERE valid_from <= TIMESTAMP '2024-01-15 00:00:00'
  AND (valid_to IS NULL OR valid_to > TIMESTAMP '2024-01-15 00:00:00')
""",
    doc="As-of temporal read (implied by the reference schema, "
    "postgres-schema.sql:45-47; SURVEY.md W2)",
)
def q_scd2_membership_as_of(spark: SparkSession, sf_dir: str) -> DataFrame:
    from echo_chambers_detection_spark.operators.scd2 import (
        as_of,
        scd2_from_changelog,
    )

    hist = scd2_from_changelog(
        _membership_changelog(spark, sf_dir),
        key_col="user_did",
        value_col="community",
        ts_col="ts",
        tiebreak_col="event_id",
    )
    return as_of(hist, "2024-01-15 00:00:00").select(
        "user_did", "community", F.unix_millis("valid_from").alias("valid_from_ms")
    )


@register(
    "membership_asof_join",
    f"""
WITH {_ORACLE_CHANGELOG_CTE},
dedup AS (
    SELECT user_did, ts, community FROM ch
    QUALIFY ROW_NUMBER() OVER (PARTITION BY user_did, ts ORDER BY event_id DESC) = 1
),
probe AS (
    SELECT event_id, CAST(user_id AS VARCHAR) AS user_did, ts FROM events
)
SELECT p.event_id, p.user_did, epoch_ms(p.ts) AS ts_ms, d.community
FROM probe p ASOF JOIN dedup d
  ON p.user_did = d.user_did AND p.ts >= d.ts
""",
    doc="Per-row point-in-time join: every event is tagged with the "
    "community its user was in AT THAT EVENT'S time — the general form "
    "of the reference's single-timestamp as-of read "
    "(project/db/postgres.py:50-57; SURVEY.md W2 superset). Implemented "
    "as one union + keyed window (operators/asof.py), never a range "
    "join; DuckDB cross-checks with its native ASOF JOIN.",
)
def q_membership_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from echo_chambers_detection_spark.operators.asof import asof_join

    ch = _membership_changelog(spark, sf_dir)
    # collapse same-instant changes to the last by event_id so the
    # boundary tie is well-defined on both engines
    versions = ch.groupBy("user_did", "ts").agg(
        F.max_by("community", "event_id").alias("community")
    )
    probes = _t(spark, sf_dir, "events").select(
        "event_id", F.col("user_id").cast("string").alias("user_did"), "ts"
    )
    return asof_join(
        probes,
        versions,
        key="user_did",
        probe_ts="ts",
        version_ts="ts",
        value_cols=["community"],
        how="inner",
    ).select(
        "event_id", "user_did", F.unix_millis("ts").alias("ts_ms"), "community"
    )


@register(
    "community_catalog_save",
    """
SELECT md5('r1:' || CAST(label AS VARCHAR)) AS id,
       'r1' AS run_id,
       label,
       CAST(COUNT(*) AS INTEGER) AS total_amount
FROM embeddings
WHERE label != -1
GROUP BY label
""",
    doc="save_communities persist shape: distinct labels -> community rows "
    "with deterministic md5 ids replacing the reference's uuid4 "
    "(project/metrics/community_detection.py:85-122; SURVEY.md S16/A3/F2/F3)",
)
def q_community_catalog_save(spark: SparkSession, sf_dir: str) -> DataFrame:
    from echo_chambers_detection_spark.operators.scd2 import save_communities

    labels = _t(spark, sf_dir, "embeddings").select(
        F.col("vec_id").cast("string").alias("node_id"), "label"
    )
    community, _ = save_communities(labels, "r1")
    return community


@register(
    "community_membership_save",
    """
SELECT md5('r1:' || CAST(label AS VARCHAR)) AS community_id,
       CAST(vec_id AS VARCHAR) AS node_id
FROM embeddings
WHERE label != -1
""",
    doc="save_communities membership rows (community_id, node_id) — the "
    "label->community_id attach join (reference J1, "
    "community_detection.py:114-120)",
)
def q_community_membership_save(spark: SparkSession, sf_dir: str) -> DataFrame:
    from echo_chambers_detection_spark.operators.scd2 import save_communities

    labels = _t(spark, sf_dir, "embeddings").select(
        F.col("vec_id").cast("string").alias("node_id"), "label"
    )
    _, membership = save_communities(labels, "r1")
    return membership


