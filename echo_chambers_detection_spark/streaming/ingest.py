"""Structured-streaming ingest (SURVEY.md §2.9 X1-X6, §3.1).

The reference runs five OS processes: a Kafka producer and per-sink
consumer loops doing per-record JSON decode + MERGE round trips
(project/main.py:20-54, consumer_user.py:66-82). Here the whole topology
is one Spark job graph:

  readStream (kafka or files) -> from_json(explicit schema) ->
  type fork (filter) -> dedup -> foreachBatch upsert to parquet tables

Kafka specifics map 1:1 when a broker exists
(`spark.readStream.format("kafka")`, startingOffsets latest/earliest =
the reference's per-consumer offset reset policy, SURVEY.md X2); this
container has no broker, so the file source stands in — the pipeline from
`from_json` down is byte-identical either way, and that is the part the
reference implements by hand.

Idempotency (X3): the reference's MERGE-by-key absorbs at-least-once
duplicates. The engine's equivalent is last-write-wins row_number dedup
inside foreachBatch against the existing table — exactly-once table state
from at-least-once delivery.

Watermarks/windows (X4): the reference has no event time at all; windows
are a capability superset exercised over the driver's events table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from echo_chambers_detection_spark.schemas import (
    POST_TOPIC_MESSAGE,
    USER_TOPIC_MESSAGE,
)


def kafka_reader_options(
    broker: str, topic: str, offset_policy: str = "latest"
) -> dict[str, str]:
    """Option map for spark.readStream.format('kafka'), mirroring the
    reference's per-consumer offset-reset policy (SURVEY.md X2):
    `latest` for the graph consumers (consumer_user.py:28,
    neo4j/consumer_post.py:23), `earliest` for the vector consumer
    (qdrant/consumer_post.py:29). Pure function so the construction is
    unit-testable without a broker."""
    if offset_policy not in ("latest", "earliest"):
        raise ValueError(
            f"offset_policy must be 'latest' or 'earliest', got {offset_policy!r}"
        )
    return {
        "kafka.bootstrap.servers": broker,
        "subscribe": topic,
        "startingOffsets": offset_policy,
        # at-least-once + MERGE-idempotent sinks tolerate replays; failing
        # the query on retention-expired offsets would not match the
        # reference consumers, which silently resume from the reset policy
        "failOnDataLoss": "false",
    }


def kafka_topic_reader(
    spark: SparkSession,
    broker: str,
    topic: str,
    offset_policy: str = "latest",
    reader=None,
):
    """The real Kafka source construction (format('kafka') + options).
    Returns the configured DataStreamReader; callers .load() it — split
    from the options so construction is exercised in tests even though
    this container has no broker or kafka connector jar.

    `reader` injects the transport object (anything with the
    DataStreamReader format/option fluent interface) — a recording fake
    in tests pins the exact wiring this function emits (VERDICT r5 #7);
    production leaves it None for spark.readStream."""
    reader = spark.readStream if reader is None else reader
    reader = reader.format("kafka")
    for k, v in kafka_reader_options(broker, topic, offset_policy).items():
        reader = reader.option(k, v)
    return reader


def decode_kafka_values(raw: DataFrame) -> DataFrame:
    """Kafka wire frame -> one string column `raw` (the message value).

    Works on ANY frame with Kafka's source schema (key/value binary,
    topic, partition, offset, timestamp, timestampType) — the streaming
    load() output in production, or a kafka-shaped BATCH frame in tests,
    so everything downstream of the broker (from_json, fork, upserts)
    is exercised against the exact wire shape without a broker."""
    return raw.select(F.col("value").cast("string").alias("raw"))


def _parse_json_values(raw: DataFrame, schema) -> DataFrame:
    # Unparseable lines are captured in an explicit corrupt-record column
    # and dropped (the reference would crash on them — json.loads at
    # consumer_user.py:75 — so they never reach a sink there either);
    # messages that parse but miss fields flow on and get the reference's
    # 'unknown' coalescing. PERMISSIVE from_json alone can't distinguish
    # the two: it returns an all-null struct for garbage.
    from pyspark.sql import types as T

    schema_c = T.StructType(
        list(schema.fields) + [T.StructField("_corrupt", T.StringType())]
    )
    return (
        raw.select(
            F.from_json(
                "raw", schema_c, {"columnNameOfCorruptRecord": "_corrupt"}
            ).alias("m")
        )
        .where(F.col("m._corrupt").isNull())
        .select("m.*")
        .drop("_corrupt")
    )


def read_json_topic(
    spark: SparkSession,
    path: str | None = None,
    schema=None,
    max_files_per_trigger: int | None = None,
    broker: str | None = None,
    topic: str | None = None,
    offset_policy: str = "latest",
) -> DataFrame:
    """One JSON-message stream source, two transports:

    - broker given: the real Kafka path — format('kafka') with the
      reference's offset policy, value cast to string;
    - else: file-backed stand-in (each line is one message `value`) for
      broker-less environments.

    Everything from from_json down is identical either way — that is the
    part the reference implements by hand."""
    if broker is not None:
        if not topic:
            raise ValueError("topic is required with broker")
        raw = decode_kafka_values(
            kafka_topic_reader(spark, broker, topic, offset_policy).load()
        )
    else:
        reader = spark.readStream.schema("value string")
        if max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
        raw = reader.text(path).withColumnRenamed("value", "raw")
    return _parse_json_values(raw, schema)


def fork_user_topic(msgs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """The multiplexed users topic split (reference routes on
    data['type'] == 'LIKED', consumer_user.py:79-82; SURVEY.md X5/P5).

    Returns (profiles, likes):
      profiles(did, handle, display_name) with unknown-coalescing (P1)
      likes(user_did, post_uri)
    """
    from echo_chambers_detection_spark.functions.cleaning import clean_unknown

    profiles = msgs.where(
        (F.col("type").isNull()) | (F.col("type") != "LIKED")
    ).select(
        clean_unknown("did").alias("did"),
        clean_unknown("handle").alias("handle"),
        clean_unknown("display_name").alias("display_name"),
    )
    likes = msgs.where(F.col("type") == "LIKED").select(
        F.col("user_did"), F.col("uri").alias("post_uri")
    )
    return profiles, likes


def parse_post_topic(msgs: DataFrame) -> DataFrame:
    """posts topic -> posts(uri, cid, text, author_did) with the presence
    filter (reference skips empty text / missing cid,
    consumer_post.py:79-87; SURVEY.md P2)."""
    from echo_chambers_detection_spark.functions.cleaning import presence_filter

    return msgs.where(presence_filter("text", "cid")).select(
        "uri", "cid", "text", F.col("author").alias("author_did")
    )


def upsert_parquet(
    batch: DataFrame,
    target: str,
    keys: list[str],
    order_col: str | None = None,
    num_buckets: int = 16,
) -> None:
    """Last-write-wins MERGE of a micro-batch into a parquet table — the
    engine's stand-in for the reference's per-record Cypher MERGE
    (consumer_user.py:44-53).

    Copy-on-write by key-hash bucket: the table is partitioned on
    `_bucket = xxhash64(keys) % num_buckets`; a micro-batch reads and
    rewrites ONLY the buckets its keys hash into (partition pruning on
    read, dynamic partition overwrite on write). The per-batch cost is
    O(touched buckets), not O(table) — the honest shape of what a
    Delta/Iceberg MERGE on the same keys does with file-level pruning.
    `_src` orders existing (0) below incoming (1); order_col breaks ties
    inside the batch."""
    spark = batch.sparkSession
    incoming = batch.withColumn(
        "_bucket", F.pmod(F.xxhash64(*keys), F.lit(num_buckets))
    ).withColumn("_src", F.lit(1))
    if os.path.exists(target):
        touched = [
            r["_bucket"]
            for r in incoming.select("_bucket").distinct().collect()
        ]
        existing = (
            spark.read.parquet(target)
            .where(F.col("_bucket").isin(touched))
            .withColumn("_src", F.lit(0))
        )
        all_rows = existing.unionByName(incoming)
    else:
        all_rows = incoming
    order = [F.desc("_src")] + (
        [F.desc(order_col)] if order_col else []
    )
    w = Window.partitionBy(*keys).orderBy(*order)
    deduped = (
        all_rows.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )
    # materialize before overwrite (reading and overwriting the same path);
    # dynamic mode replaces only the buckets present in `deduped`
    (
        deduped.localCheckpoint(eager=True)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("_bucket")
        .parquet(target)
    )


def run_user_topic_ingest(
    spark: SparkSession,
    source_path: str,
    users_path: str,
    engagements_path: str,
    checkpoint_dir: str,
) -> None:
    """End-to-end users-topic pipeline with availableNow trigger: fork,
    dedup, MERGE-upsert profiles, append-dedup LIKED edges (the
    reference's consumer pair, SURVEY.md S3/S6/S7)."""

    msgs = read_json_topic(spark, source_path, USER_TOPIC_MESSAGE)

    def process(batch: DataFrame, batch_id: int) -> None:
        profiles, likes = fork_user_topic(batch)
        upsert_parquet(profiles, users_path, keys=["did"])
        edges = likes.withColumn("kind", F.lit("LIKED"))
        upsert_parquet(
            edges, engagements_path, keys=["user_did", "post_uri", "kind"]
        )

    (
        msgs.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def windowed_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling/sliding windowed counts with a watermark (X4 superset).
    Works identically on a static or streaming events frame."""
    df = events
    if df.isStreaming:
        df = df.withWatermark("ts", watermark)
    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    return df.groupBy(win.alias("w"), "event_type").agg(
        F.count("*").alias("n_events")
    ).select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        "event_type",
        "n_events",
    )


def streaming_exact_dedup(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Exact content dedup on an ingest stream: drop any document whose
    md5(text) was already seen (the streaming face of
    operators/dedup.exact_dedup_groups — same hash, same keep-first
    policy within the state horizon).

    State is BOUNDED by the watermark via dropDuplicatesWithinWatermark:
    a key's state is dropped once the event-time watermark passes it, so
    at 100 TB/day ingest the dedup state holds one horizon of hashes,
    not the full corpus (plain dropDuplicates on a stream grows state
    forever — corpus-lifetime exact dedup belongs to the batch operator
    over the accumulated table). On a static frame this degrades to
    plain dropDuplicates for testability, mirroring windowed_counts.
    """
    hashed = docs.withColumn("_text_md5", F.md5(F.col(text_col)))
    if hashed.isStreaming:
        return (
            hashed.withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(["_text_md5"])
            .drop("_text_md5")
        )
    return hashed.dropDuplicates(["_text_md5"]).drop("_text_md5")


def near_dedup_batch_against_store(
    batch: DataFrame,
    store_path: str,
    survivors_path: str,
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> None:
    """foreachBatch near-duplicate dedup stage: the streaming face of
    the simhash64 chain (operators/dedup.py), in the shape a production
    ingest actually runs —

    1. sign the micro-batch ROW-LOCALLY (`simhash64_rowwise`: one fold
       per row, zero shuffle, no state);
    2. drop within-batch near-dups (banded candidates + exact Hamming
       verify, keep the min id — the batch is small, the corpus is not);
    3. band-join survivors against the ACCUMULATED signature store and
       drop anything within the Hamming budget of a previously ingested
       document. The store is partitioned on `_bkey = (band, hash(bv) %
       num_buckets)`; the probe collects the batch's touched _bkey list
       (≤ batch × bands values) and reads ONLY those partitions —
       per-batch probe cost is O(touched buckets), never O(corpus),
       the same copy-on-write pruning shape as `upsert_parquet`;
    4. append the survivors to `survivors_path` and their band-keyed
       signatures to the store.

    Contrast with `streaming_exact_dedup`: exact dedup fits the native
    watermarked-state operator because its key is one hash; near-dup
    needs candidate+verify against ALL history, which belongs in an
    indexed store, not in watermark-bounded operator state.
    """
    from echo_chambers_detection_spark.operators.dedup import (
        simhash64_rowwise,
    )

    bands = max_hamming + 1
    band_bits = 64 // bands
    mask = (1 << band_bits) - 1

    signed = batch.withColumn(
        "_sig", simhash64_rowwise("text")
    ).localCheckpoint(eager=True)

    def banded(df: DataFrame, sig: str) -> DataFrame:
        parts = []
        for i in range(bands):
            bv = F.shiftrightunsigned(F.col(sig), i * band_bits)
            if band_bits < 64:
                bv = bv.bitwiseAND(F.lit(mask))
            parts.append(
                df.select(
                    F.col(id_col).alias("_id"),
                    F.col(sig).alias("_s"),
                    F.lit(i).alias("band"),
                    bv.alias("bv"),
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    # -- within-batch: candidates via banding, verify, keep min id ----
    keyed = banded(signed, "_sig")
    cand = (
        keyed.alias("a")
        .join(keyed.alias("b"), ["band", "bv"])
        .where(F.col("a._id") > F.col("b._id"))
        .where(
            F.bit_count(
                F.col("a._s").bitwiseXOR(F.col("b._s"))
            )
            <= max_hamming
        )
        .select(F.col("a._id").alias("_id"))
        .distinct()
    )
    local_kept = signed.join(cand, signed[id_col] == cand["_id"], "left_anti")

    # -- against the store: partition-pruned band probe ---------------
    num_buckets = 64
    bkey = F.concat_ws(
        "_",
        F.col("band").cast("string"),
        F.pmod(F.xxhash64(F.col("bv")), F.lit(num_buckets)).cast("string"),
    )
    if os.path.exists(store_path):
        probe = banded(local_kept, "_sig").withColumn("_bkey", bkey)
        touched = [
            r["_bkey"] for r in probe.select("_bkey").distinct().collect()
        ]
        store = (
            batch.sparkSession.read.parquet(store_path)
            .where(F.col("_bkey").isin(touched))
        )
        hit = (
            probe.join(store, ["band", "bv"])
            .where(
                F.bit_count(F.col("_s").bitwiseXOR(F.col("sig")))
                <= max_hamming
            )
            .select(F.col("_id"))
            .distinct()
        )
        kept = local_kept.join(
            hit, local_kept[id_col] == hit["_id"], "left_anti"
        )
    else:
        kept = local_kept
    kept = kept.localCheckpoint(eager=True)

    kept.drop("_sig").write.mode("append").parquet(survivors_path)
    (
        banded(kept, "_sig")
        .select("band", "bv", F.col("_s").alias("sig"))
        .withColumn("_bkey", bkey)
        .write.mode("append")
        .partitionBy("_bkey")
        .parquet(store_path)
    )
