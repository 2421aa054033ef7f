"""Event-time windows (SURVEY.md M5 / X4 superset).

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
# Event-time windows (SURVEY.md M5 / X4 superset): tumbling, sliding,
# session. Batch formulations here (oracle-checkable); streaming
# equivalence is proven in tests/test_streaming.py.
# ===========================================================================


@register(
    "tumbling_event_counts",
    """
SELECT epoch_ms(time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP))) AS window_start_ms,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
""",
    doc="Tumbling 1h event-time windows (X4; reference has no event time "
    "at all — capability superset over the events fixture)",
)
def q_tumbling_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            _dec_sum("value").alias("total_value"),
        )
        .select(
            F.unix_millis(F.col("w.start")).alias("window_start_ms"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    "sliding_event_counts",
    """
WITH phased AS (
    SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS b, event_type
    FROM events
    UNION ALL
    SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP), INTERVAL '30 minutes') AS b, event_type
    FROM events
)
SELECT epoch_ms(b) AS window_start_ms, event_type, COUNT(*) AS n_events
FROM phased GROUP BY 1, 2
""",
    doc="Sliding 1h/30m windows — each event lands in two phase-shifted "
    "buckets, which is exactly Spark's window(slide) expansion",
)
def q_sliding_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type"
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            F.unix_millis(F.col("w.start")).alias("window_start_ms"),
            "event_type",
            "n_events",
        )
    )


@register(
    "session_windows_by_type",
    """
WITH ordered AS (
    SELECT event_type, CAST(ts AS TIMESTAMP) AS ts, event_id,
           CASE WHEN LAG(CAST(ts AS TIMESTAMP)) OVER w IS NULL
                  OR CAST(ts AS TIMESTAMP) - LAG(CAST(ts AS TIMESTAMP)) OVER w
                     > INTERVAL '5 minutes'
                THEN 1 ELSE 0 END AS new_sess
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY CAST(ts AS TIMESTAMP), event_id)
),
sess AS (
    SELECT event_type, ts,
           SUM(new_sess) OVER (
               PARTITION BY event_type ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING
           ) AS sid
    FROM ordered
)
SELECT event_type,
       epoch_ms(MIN(ts)) AS session_start_ms,
       epoch_ms(MAX(ts) + INTERVAL '5 minutes') AS session_end_ms,
       COUNT(*) AS n_events
FROM sess
GROUP BY event_type, sid
""",
    doc="Session windows with a 5-minute gap (Spark session_window vs the "
    "classic gaps-and-islands SQL formulation)",
)
def q_session_windows_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window("ts", "5 minutes").alias("w"), "event_type"
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "event_type",
            F.unix_millis(F.col("w.start")).alias("session_start_ms"),
            F.unix_millis(F.col("w.end")).alias("session_end_ms"),
            "n_events",
        )
    )




@register(
    "event_interarrival_stats",
    """
WITH g AS (
    SELECT event_type,
           epoch_ms(ts) - LAG(epoch_ms(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) AS gap_ms
    FROM events
)
SELECT event_type,
       COUNT(*) AS n_gaps,
       CAST(SUM(gap_ms) AS BIGINT) AS sum_gap_ms,
       MAX(gap_ms) AS max_gap_ms,
       ROUND(SUM(gap_ms) / (COUNT(*) * 1000.0), 6) AS avg_gap_s
FROM g WHERE gap_ms IS NOT NULL
GROUP BY 1
""",
    doc="Per-user event inter-arrival gaps rolled up by the later "
    "event's type — the activity-cadence profile a feed-ingest "
    "pipeline watches for bot bursts (superset of the reference's "
    "event-time surface, SURVEY.md X4). Exact bigint millisecond "
    "sums; the single terminal division is bit-identical across "
    "engines. The lag window has a total per-user order (ts, "
    "event_id) so tied timestamps cannot flip gaps between runs. "
    "Scale shape: ONE shuffle on user_id for the window, then a "
    "map-side-combining agg on the bounded event_type key — no "
    "global sort anywhere.",
)
def q_event_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from echo_chambers_detection_spark.operators.eventstats import (
        interarrival_gap_stats,
    )

    return interarrival_gap_stats(_t(spark, sf_dir, "events"))


@register(
    "user_session_stats",
    """
WITH g AS (
    SELECT user_id, event_id, epoch_ms(ts) AS ms,
           epoch_ms(ts) - LAG(epoch_ms(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) AS gap_ms
    FROM events
),
marked AS (
    SELECT user_id, event_id, ms,
           CASE WHEN gap_ms IS NULL OR gap_ms > 28800000
                THEN 1 ELSE 0 END AS is_new
    FROM g
),
numbered AS (
    SELECT user_id, ms,
           SUM(is_new) OVER (
               PARTITION BY user_id ORDER BY ms, event_id
               ROWS UNBOUNDED PRECEDING
           ) AS sess
    FROM marked
),
sessions AS (
    SELECT user_id, sess, COUNT(*) AS n_events,
           MAX(ms) - MIN(ms) AS dur_ms
    FROM numbered GROUP BY 1, 2
)
SELECT user_id,
       COUNT(*) AS n_sessions,
       CAST(SUM(n_events) AS BIGINT) AS total_events,
       CAST(SUM(dur_ms) AS BIGINT) AS sum_session_ms,
       CAST(MAX(n_events) AS BIGINT) AS max_session_events
FROM sessions GROUP BY 1
""",
    doc="Gap-based per-user sessionization (8h inactivity threshold — "
    "the median inter-event gap at this cadence is ~7.3h, so sessions "
    "genuinely merge AND split): lag-gap mark, running-sum session "
    "numbering, per-session rollup, per-user profile. The stacked-"
    "window shape (lag, then cumulative sum over the SAME per-user "
    "order) is the canonical sessionization plan — both windows share "
    "one shuffle on user_id and Spark executes them in a single sort "
    "pass. All-integer outputs, hash-exact. Complements "
    "session_windows_by_type (Spark's native session_window "
    "aggregation, the streaming-capable formulation).",
)
def q_user_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from echo_chambers_detection_spark.operators.eventstats import (
        user_session_stats,
    )

    return user_session_stats(
        _t(spark, sf_dir, "events"), gap_limit_ms=8 * 3600 * 1000
    )


@register(
    "event_type_markov_transitions",
    """
WITH seq AS (
    SELECT user_id, event_type,
           LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) AS prev_type
    FROM events
),
t AS (
    SELECT prev_type AS from_type, event_type AS to_type,
           COUNT(*) AS n
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY 1, 2
)
SELECT from_type, to_type, n,
       ROUND(n * 1.0 / SUM(n) OVER (PARTITION BY from_type), 6) AS p
FROM t
""",
    doc="First-order Markov transition matrix over per-user event-type "
    "sequences (SURVEY.md X4 superset, the behavioral-cadence companion "
    "to event_interarrival_stats): lag window keyed on user, transition "
    "counts, and row-normalized probabilities. Scale shape: ONE shuffle "
    "on user_id for the lag, a map-side-combining agg on the bounded "
    "(from,to) key grid, and the normalizing window runs over that "
    "tiny grid, not the events — the integer counts make the hash "
    "exact and the single division is bit-identical across engines. "
    "The per-user order (ts, event_id) is total, so tied timestamps "
    "cannot flip transitions between runs.",
)
def q_event_type_markov_transitions(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events")
    seq = ev.select(
        "event_type",
        F.lag("event_type")
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("from_type"),
    )
    t = (
        seq.where(F.col("from_type").isNotNull())
        .groupBy("from_type", F.col("event_type").alias("to_type"))
        .agg(F.count("*").alias("n"))
    )
    return t.select(
        "from_type",
        "to_type",
        "n",
        F.round(
            F.col("n") / F.sum("n").over(Window.partitionBy("from_type")),
            6,
        ).alias("p"),
    )


@register(
    "user_cohort_retention",
    """
WITH firsts AS (
    SELECT user_id, MIN(ts) AS t0 FROM events GROUP BY user_id
),
acts AS (
    SELECT DISTINCT e.user_id,
           (CAST(e.ts AS DATE) - DATE '1970-01-05') // 7 AS w,
           (CAST(f.t0 AS DATE) - DATE '1970-01-05') // 7 AS w0
    FROM events e JOIN firsts f USING (user_id)
)
SELECT CAST(w0 AS BIGINT) AS cohort_week,
       CAST(w - w0 AS BIGINT) AS week_offset,
       COUNT(*) AS n_users
FROM acts GROUP BY 1, 2
""",
    doc="Weekly cohort-retention matrix — the standard product-"
    "analytics triangle: users bucketed by first-seen week, counted "
    "once per (cohort, weeks-since-first) cell. Weeks are Monday-"
    "aligned INTEGER indexes computed as floor((epoch_day - 4) / 7) "
    "on both sides, sidestepping the date_trunc('week') and "
    "date_diff('week') engine-boundary differences entirely — the "
    "whole query is integer arithmetic, hash-exact. Scale shape: one "
    "first-seen groupBy (map-side combine), one AQE broadcast-or-"
    "shuffle join of the O(users) dimension back onto the event "
    "stream, one (user, week) distinct, one cell groupBy — all keyed "
    "on user_id or small grids, no window function.",
)
def q_user_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")

    def wk(c):
        return F.floor(F.datediff(F.to_date(c), F.lit("1970-01-05")) / 7)

    firsts = ev.groupBy("user_id").agg(F.min("ts").alias("t0"))
    acts = (
        ev.join(firsts, "user_id")
        .select("user_id", wk("ts").alias("w"), wk("t0").alias("w0"))
        .distinct()
    )
    return acts.groupBy(
        F.col("w0").cast("bigint").alias("cohort_week"),
        (F.col("w") - F.col("w0")).cast("bigint").alias("week_offset"),
    ).agg(F.count("*").alias("n_users"))


@register(
    "event_funnel_counts",
    """
WITH s1 AS (
    SELECT user_id, MIN(ts) AS t1 FROM events
    WHERE event_type = 'view' GROUP BY user_id
),
s2 AS (
    SELECT e.user_id, MIN(e.ts) AS t2 FROM events e JOIN s1 USING (user_id)
    WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id
),
s3 AS (
    SELECT e.user_id, MIN(e.ts) AS t3 FROM events e JOIN s2 USING (user_id)
    WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id
)
SELECT 'view' AS stage, COUNT(*) AS n_users FROM s1
UNION ALL SELECT 'view>click', COUNT(*) FROM s2
UNION ALL SELECT 'view>click>purchase', COUNT(*) FROM s3
""",
    doc="Ordered-funnel conversion counts (view -> click -> purchase): "
    "each stage is the users whose earliest qualifying event STRICTLY "
    "follows their previous stage's earliest event — the textbook "
    "first-touch funnel, deterministic because every stage reduces to "
    "MIN(ts) under a strict inequality (timestamp ties can't flip "
    "membership). Scale shape: each stage is one filtered groupBy "
    "plus one join against the previous stage's O(converted-users) "
    "frame — the stage frames shrink monotonically, so at 100 TB the "
    "deep-funnel joins are broadcast-side; no window function, no "
    "event-stream self-join.",
)
def q_event_funnel_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    s1 = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.where(F.col("event_type") == "click")
        .join(s1, "user_id")
        .where(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.where(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .where(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        s1.agg(F.count("*").alias("n_users"))
        .select(F.lit("view").alias("stage"), "n_users")
        .unionByName(
            s2.agg(F.count("*").alias("n_users")).select(
                F.lit("view>click").alias("stage"), "n_users"
            )
        )
        .unionByName(
            s3.agg(F.count("*").alias("n_users")).select(
                F.lit("view>click>purchase").alias("stage"), "n_users"
            )
        )
    )
