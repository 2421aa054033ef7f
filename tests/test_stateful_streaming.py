"""applyInPandasWithState operators (SURVEY.md §2.9 X-superset): running
per-key aggregates and first-seen dedup, driven by a two-batch file
stream so state genuinely crosses micro-batch boundaries."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from echo_chambers_detection_spark.streaming.stateful import (
    first_seen,
    running_user_counts,
)

SCHEMA = StructType(
    [
        StructField("user_did", StringType()),
        StructField("value", DoubleType()),
        StructField("ts_ms", LongType()),
    ]
)


def _write(path, name, rows):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _run_stream(spark, src, ckpt, out, build, mode="append"):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")  # one file per micro-batch
        .json(src)
        .withColumn("ts", F.timestamp_millis(F.col("ts_ms")))
    )
    q = (
        build(stream)
        .writeStream.foreachBatch(
            lambda batch, _id: batch.write.mode("append").parquet(out)
        )
        .option("checkpointLocation", ckpt)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_running_counts_accumulate_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    _write(src, "b1.json", [
        {"user_did": "u1", "value": 1.0, "ts_ms": 1000},
        {"user_did": "u1", "value": 2.0, "ts_ms": 2000},
        {"user_did": "u2", "value": 5.0, "ts_ms": 3000},
    ])
    _write(src, "b2.json", [
        {"user_did": "u1", "value": 4.0, "ts_ms": 4000},
        {"user_did": "u3", "value": 7.0, "ts_ms": 5000},
    ])
    out = str(tmp_path / "out")
    _run_stream(
        spark, src, str(tmp_path / "ckpt"), out, running_user_counts, mode="update"
    )
    rows = spark.read.parquet(out).collect()
    # update mode: one emission per (user, batch-they-appear-in); the LAST
    # emission per user is the running total
    last = {}
    for r in sorted(rows, key=lambda r: r["n_events"]):
        last[r["user_did"]] = (r["n_events"], r["total_value"])
    assert last["u1"] == (3, 7.0)
    assert last["u2"] == (1, 5.0)
    assert last["u3"] == (1, 7.0)
    # u1 appeared in both batches -> two emissions, monotone counts
    u1 = sorted(r["n_events"] for r in rows if r["user_did"] == "u1")
    assert u1 == [2, 3]


def test_first_seen_dedups_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    _write(src, "b1.json", [
        {"user_did": "u1", "value": 0.0, "ts_ms": 2000},
        {"user_did": "u1", "value": 0.0, "ts_ms": 1000},  # earlier in same batch
        {"user_did": "u2", "value": 0.0, "ts_ms": 3000},
    ])
    _write(src, "b2.json", [
        {"user_did": "u1", "value": 0.0, "ts_ms": 500},  # duplicate key: swallowed
        {"user_did": "u3", "value": 0.0, "ts_ms": 9000},
    ])
    out = str(tmp_path / "out")
    _run_stream(spark, src, str(tmp_path / "ckpt"), out, first_seen)
    rows = spark.read.parquet(out).collect()
    got = {r["user_did"]: r["first_ts_ms"] for r in rows}
    assert len(rows) == 3  # exactly one emission per key, ever
    assert got == {"u1": 1000, "u2": 3000, "u3": 9000}


def test_streaming_packing_matches_batch_fixpoint(spark, tmp_path):
    """streaming_token_packing over a two-batch in-order file stream
    reproduces the batch `token_pack_chunks` window EXACTLY — chunk
    indices keep growing across the micro-batch boundary (per-shard
    cum state), which is the whole point of the stateful form."""
    import json as _json

    from pyspark.sql.types import StringType as _S

    from echo_chambers_detection_spark.catalog import QUERY_REGISTRY
    from echo_chambers_detection_spark.streaming.stateful import (
        streaming_token_packing,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = [
        {"doc_id": r["doc_id"], "text": r["text"]}
        for r in docs.select("doc_id", "text").collect()
    ]
    rows.sort(key=lambda r: r["doc_id"])
    mid = len(rows) // 2
    src = str(tmp_path / "src")
    _write(src, "b1.json", rows[:mid])
    _write(src, "b2.json", rows[mid:])

    doc_schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", _S())]
    )
    out = str(tmp_path / "out")
    stream = (
        spark.readStream.schema(doc_schema)
        .option("maxFilesPerTrigger", "1")
        .json(src)
    )
    q = (
        streaming_token_packing(stream)
        .writeStream.foreachBatch(
            lambda batch, _id: batch.write.mode("append").parquet(out)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {
        r["doc_id"]: (
            r["shard"], r["n_tokens"], r["first_chunk"],
            r["last_chunk"], r["n_chunks"],
        )
        for r in spark.read.parquet(out).collect()
    }
    want = {
        r["doc_id"]: (
            r["shard"], r["n_tokens"], r["first_chunk"],
            r["last_chunk"], r["n_chunks"],
        )
        for r in QUERY_REGISTRY["token_pack_chunks"]
        .spark(spark, "/root/testdata/sf0.001")
        .collect()
    }
    assert got == want
    # the state genuinely crossed batches: some doc in batch 2 starts
    # mid-chunk (first_chunk > 0) on every populated shard
    assert any(v[2] > 0 for v in got.values())


EVENT_SCHEMA = StructType(
    [
        StructField("user_did", StringType()),
        StructField("event_type", StringType()),
        StructField("ts_ms", LongType()),
    ]
)


def test_streaming_funnel_crosses_batches(spark, tmp_path):
    """Stage machine advances across micro-batches, tie timestamps do
    NOT advance a stage (strict inequality), and a click before the
    first view never counts."""
    from echo_chambers_detection_spark.streaming.stateful import (
        streaming_funnel_stages,
    )

    src = str(tmp_path / "src")
    # batch 1: u1 views at 10 (click at 10 is a TIE -> no advance);
    # u2 clicks at 5 before ever viewing -> stays stage 0 via view at 8
    _write(src, "b1.json", [
        {"user_did": "u1", "event_type": "view", "ts_ms": 10},
        {"user_did": "u1", "event_type": "click", "ts_ms": 10},
        {"user_did": "u2", "event_type": "click", "ts_ms": 5},
        {"user_did": "u2", "event_type": "view", "ts_ms": 8},
    ])
    # batch 2: u1 clicks at 12 then purchases at 15; u2 purchases at 9
    # without ever clicking -> stays stage 1
    _write(src, "b2.json", [
        {"user_did": "u1", "event_type": "click", "ts_ms": 12},
        {"user_did": "u1", "event_type": "purchase", "ts_ms": 15},
        {"user_did": "u2", "event_type": "purchase", "ts_ms": 9},
    ])
    out = str(tmp_path / "out")
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(src)
        .withColumn("ts", F.timestamp_millis(F.col("ts_ms")))
    )
    q = (
        streaming_funnel_stages(stream)
        .writeStream.foreachBatch(
            lambda batch, _id: batch.write.mode("append").parquet(out)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.read.parquet(out).collect()
    # last emission per user wins (update mode re-emits per batch)
    final = {}
    for r in sorted(rows, key=lambda r: (r["stage"],)):
        final[r["user_did"]] = r
    assert final["u1"]["stage"] == 3
    assert (final["u1"]["t1_ms"], final["u1"]["t2_ms"], final["u1"]["t3_ms"]) == (10, 12, 15)
    assert final["u2"]["stage"] == 1
    assert final["u2"]["t1_ms"] == 8 and final["u2"]["t2_ms"] is None


def test_streaming_funnel_matches_batch_query(spark, tmp_path):
    """Single-batch availableNow replay of the sf0.01 events table must
    reproduce the batch event_funnel_counts stage totals exactly."""
    from echo_chambers_detection_spark.catalog import QUERY_REGISTRY
    from echo_chambers_detection_spark.sources.tables import load_table
    from echo_chambers_detection_spark.streaming.stateful import (
        streaming_funnel_stages,
    )

    sf = "/root/testdata/sf0.01"
    ev = load_table(spark, "events", sf)
    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    ev.select(
        F.col("user_id").cast("string").alias("user_did"),
        "event_type",
        F.unix_millis("ts").alias("ts_ms"),
    ).coalesce(1).write.mode("overwrite").json(src)
    out = str(tmp_path / "out")
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .json(src)
        .withColumn("ts", F.timestamp_millis(F.col("ts_ms")))
    )
    q = (
        streaming_funnel_stages(stream)
        .writeStream.foreachBatch(
            lambda batch, _id: batch.write.mode("append").parquet(out)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    stages = [r["stage"] for r in spark.read.parquet(out).collect()]
    got = {
        "view": sum(1 for s in stages if s >= 1),
        "view>click": sum(1 for s in stages if s >= 2),
        "view>click>purchase": sum(1 for s in stages if s >= 3),
    }
    want = {
        r["stage"]: r["n_users"]
        for r in QUERY_REGISTRY["event_funnel_counts"].spark(spark, sf).collect()
    }
    assert got == want


def test_streaming_sessions_gap_and_event_time_timeout(spark, tmp_path):
    """Sessions split on the gap WITHIN a micro-batch ('gap' close),
    and quiet users close when the event-time WATERMARK passes their
    last event + gap ('timeout' close, state removed) — fully
    deterministic: timers fire on watermark progress, never on wall
    clock. u3's session stays open (nothing ever outruns its timer)."""
    from echo_chambers_detection_spark.streaming.stateful import (
        streaming_session_stats,
    )

    src = str(tmp_path / "src")
    # batch 1: u1 has an in-batch 19s gap (two sessions; the first
    # closes by 'gap' inside this batch); u2 has one event. Watermark
    # after the batch: 21000.
    # ts values sit well above epoch 0: the INITIAL watermark is 0,
    # and an event whose time equals the watermark is dropped as late
    B = 10_000_000
    _write(src, "b1.json", [
        {"user_did": "u1", "event_type": "view", "ts_ms": B + 0},
        {"user_did": "u1", "event_type": "view", "ts_ms": B + 1000},
        {"user_did": "u1", "event_type": "view", "ts_ms": B + 20000},
        {"user_did": "u1", "event_type": "view", "ts_ms": B + 21000},
        {"user_did": "u2", "event_type": "view", "ts_ms": B + 500},
    ])
    # batch 2 pushes the watermark to 99000: u2's timer (500 + 5000)
    # fires while this batch runs (watermark 21000), u1's open-session
    # timer (21000 + 5000) fires in the final cleanup batch.
    _write(src, "b2.json", [
        {"user_did": "u3", "event_type": "view", "ts_ms": B + 99000},
    ])
    out = str(tmp_path / "out")
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(src)
        .withColumn("ts", F.timestamp_millis(F.col("ts_ms")))
    )
    q = (
        streaming_session_stats(stream, gap_ms=5000)
        .writeStream.foreachBatch(
            lambda batch, _id: batch.write.mode("append").parquet(out)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.read.parquet(out).collect()
    got = {
        (r["user_did"], r["closed_by"]): (
            r["session_start_ms"], r["session_end_ms"], r["n_events"]
        )
        for r in rows
    }
    assert got == {
        ("u1", "gap"): (B + 0, B + 1000, 2),
        ("u1", "timeout"): (B + 20000, B + 21000, 2),
        ("u2", "timeout"): (B + 500, B + 500, 1),
    }
