"""Structured-streaming tests (SURVEY.md §2.9): availableNow micro-batch
over file-backed topics, duplicate-injection MERGE idempotency (X3),
multiplexed-topic fork (X5), and stream-vs-batch window equivalence (X4).
Mirrors the reference consumers at project/neo4j/consumer_user.py:66-82."""

from __future__ import annotations

import json
import os

import pytest

from pyspark.sql import functions as F

from echo_chambers_detection_spark.sources.tables import load_table
from echo_chambers_detection_spark.streaming.ingest import (
    run_user_topic_ingest,
    windowed_counts,
)

SF = "/root/testdata/sf0.001"


def _write_topic(path: str, messages: list[dict], name: str) -> None:
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, name), "w") as f:
        for msg in messages:
            f.write(json.dumps(msg) + "\n")


@pytest.fixture()
def topic_dirs(tmp_path):
    return {
        "source": str(tmp_path / "topic"),
        "users": str(tmp_path / "users.parquet"),
        "engagements": str(tmp_path / "engagements.parquet"),
        "ckpt": str(tmp_path / "ckpt"),
        "ckpt2": str(tmp_path / "ckpt2"),
    }


MESSAGES_BATCH_1 = [
    # profile messages (no type field -> profile path)
    {"did": "u1", "handle": "alice", "display_name": "Alice"},
    {"did": "u2", "handle": "", "display_name": None},  # -> 'unknown' (P1)
    # duplicate profile, later wins (MERGE SET semantics)
    {"did": "u1", "handle": "alice2", "display_name": "Alice II"},
    # LIKED edges, with an exact duplicate (at-least-once delivery)
    {"type": "LIKED", "user_did": "u1", "uri": "p1"},
    {"type": "LIKED", "user_did": "u1", "uri": "p1"},
    {"type": "LIKED", "user_did": "u2", "uri": "p1"},
    # edge arriving before any profile for u3 (placeholder-node semantics)
    {"type": "LIKED", "user_did": "u3", "uri": "p2"},
]


def test_user_topic_ingest_fork_and_idempotency(spark, topic_dirs):
    _write_topic(topic_dirs["source"], MESSAGES_BATCH_1, "b1.json")
    run_user_topic_ingest(
        spark,
        topic_dirs["source"],
        topic_dirs["users"],
        topic_dirs["engagements"],
        topic_dirs["ckpt"],
    )

    users = {r["did"]: r for r in spark.read.parquet(topic_dirs["users"]).collect()}
    assert set(users) == {"u1", "u2"}
    assert users["u2"]["handle"] == "unknown"
    assert users["u2"]["display_name"] == "unknown"

    edges = spark.read.parquet(topic_dirs["engagements"])
    rows = {(r["user_did"], r["post_uri"]) for r in edges.collect()}
    # duplicate (u1, p1) absorbed; u3 edge kept despite missing profile
    assert rows == {("u1", "p1"), ("u2", "p1"), ("u3", "p2")}
    assert edges.count() == 3


def test_second_batch_upserts_without_duplicating(spark, topic_dirs):
    _write_topic(topic_dirs["source"], MESSAGES_BATCH_1, "b1.json")
    run_user_topic_ingest(
        spark, topic_dirs["source"], topic_dirs["users"],
        topic_dirs["engagements"], topic_dirs["ckpt"],
    )
    # second wave: profile update for u1, replay of an old edge, new edge
    _write_topic(
        topic_dirs["source"],
        [
            {"did": "u1", "handle": "alice3", "display_name": "Alice III"},
            {"type": "LIKED", "user_did": "u1", "uri": "p1"},  # replay
            {"type": "LIKED", "user_did": "u3", "uri": "p3"},
        ],
        "b2.json",
    )
    run_user_topic_ingest(
        spark, topic_dirs["source"], topic_dirs["users"],
        topic_dirs["engagements"], topic_dirs["ckpt"],
    )
    users = {r["did"]: r for r in spark.read.parquet(topic_dirs["users"]).collect()}
    # checkpoint means batch 1 files are not reprocessed; update applied
    assert users["u1"]["handle"] == "alice3"
    assert len(users) == 2
    edges = spark.read.parquet(topic_dirs["engagements"])
    assert edges.count() == 4  # replayed edge absorbed, new edge added


def test_stream_batch_window_equivalence(spark, tmp_path):
    """The same windowed aggregation over the same rows must agree between
    a streaming (availableNow) run and the batch run the catalog oracles
    check (X4)."""
    events = load_table(spark, "events", SF)
    src = str(tmp_path / "events_us.parquet")
    events.write.parquet(src)

    batch = windowed_counts(spark.read.parquet(src)).orderBy(
        "window_start", "event_type"
    )

    stream_src = (
        spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    )
    out_path = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    (
        windowed_counts(stream_src)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    streamed = spark.read.parquet(out_path).orderBy("window_start", "event_type")
    got = [tuple(r) for r in streamed.collect()]
    # append mode emits a window only once the watermark passes its end:
    # the batch reference must be cut at max_event_time - watermark delay
    max_ts = spark.read.parquet(src).agg(F.max("ts")).first()[0]
    want = [
        tuple(r)
        for r in batch.collect()
        if (max_ts - r["window_end"]).total_seconds() >= 2 * 3600
    ]
    assert len(got) > 0
    assert got == want
