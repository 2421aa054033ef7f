"""Stream-stream interval joins (Structured Streaming superset, X-family).

The reference's consumers enrich one Kafka topic at a time; a real-time
funnel (view -> click attribution) needs two live streams joined on key
+ event-time proximity. Spark's stream-stream inner join handles this
with BOUNDED state as long as (a) both sides carry watermarks and
(b) the join condition constrains the two event times against each
other — the range condition is what lets the engine expire buffered
rows instead of keeping every past event forever. At 100 TB/day the
watermark delay IS the state-size knob: state per key ~ rate x
(watermark + lag window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def attribute_clicks_to_views(
    views: DataFrame,
    clicks: DataFrame,
    max_lag: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Inner interval join: each click matched to the view(s) by the
    same user in the preceding ``max_lag``. Works identically on batch
    and streaming frames (the watermark is a no-op in batch), which is
    what the stream/batch equivalence test pins."""
    v = views.select(
        F.col("user_id"),
        F.col("ts").alias("view_ts"),
        F.col("event_id").alias("view_id"),
    )
    c = clicks.select(
        F.col("user_id"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    if views.isStreaming:
        v = v.withWatermark("view_ts", watermark)
    if clicks.isStreaming:
        c = c.withWatermark("click_ts", watermark)
    return v.join(
        c,
        [
            v["user_id"] == c["user_id"],
            c["click_ts"] >= v["view_ts"],
            c["click_ts"] <= v["view_ts"] + F.expr(f"INTERVAL {max_lag}"),
        ],
        "inner",
    ).select(
        v["user_id"].alias("user_id"),
        "view_id",
        "click_id",
        "view_ts",
        "click_ts",
    )
