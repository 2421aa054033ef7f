"""Custom stateful streaming operators via applyInPandasWithState
(SURVEY.md §2.9 X-superset).

The reference's consumers are implicitly stateful: every poll loop
re-reads/overwrites per-user rows in Neo4j/Qdrant (MERGE-upsert,
project/neo4j/consumer_user.py:25-56) — the store IS the state. On
Spark the idiomatic shape is explicit operator state: per-key state rows
managed by the engine, checkpointed with the query, no external store in
the loop. Arrow-batched (one pandas call per key group per micro-batch),
never row-at-a-time.

Scale: state is partitioned by the group key across executors; memory is
O(distinct keys) per executor — per-key payload here is two scalars
(count + running value sum), so 100M users ≈ a few GB cluster-wide.
Use GroupStateTimeout to bound the working set when keys churn.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

RUNNING_OUTPUT = StructType(
    [
        StructField("user_did", StringType(), False),
        StructField("n_events", LongType(), False),
        StructField("total_value", DoubleType(), True),
    ]
)

_RUNNING_STATE = StructType(
    [
        StructField("n", LongType(), False),
        StructField("total", DoubleType(), True),
    ]
)

FIRST_SEEN_OUTPUT = StructType(
    [
        StructField("user_did", StringType(), False),
        StructField("first_ts_ms", LongType(), True),
    ]
)

_SEEN_STATE = StructType([StructField("first_ts_ms", LongType(), True)])


def _running_fn(
    key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].fillna(0.0).sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_did": [key[0]], "n_events": [n], "total_value": [total]}
    )


def running_user_counts(events: DataFrame) -> DataFrame:
    """Per-user running (count, value-sum) emitted every micro-batch the
    user appears in — the streaming dual of `events.groupBy(user).agg()`
    and the engine-state version of the reference's read-modify-write
    consumer loop. Input needs (user_did string, value double)."""
    return (
        events.select(
            F.col("user_did").cast("string").alias("user_did"),
            F.col("value").cast("double").alias("value"),
        )
        .groupBy("user_did")
        .applyInPandasWithState(
            _running_fn,
            RUNNING_OUTPUT,
            _RUNNING_STATE,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )


def _first_seen_fn(
    key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        # key already emitted once; swallow duplicates (idempotent upsert)
        for _ in pdfs:
            pass
        return
    first_ts = None
    for pdf in pdfs:
        if len(pdf):
            mn = int(pdf["ts_ms"].min())
            first_ts = mn if first_ts is None else min(first_ts, mn)
    state.update((first_ts,))
    yield pd.DataFrame({"user_did": [key[0]], "first_ts_ms": [first_ts]})


def first_seen(events: DataFrame) -> DataFrame:
    """Visited-set dedup as operator state (SURVEY.md U4/X3): emit each
    key exactly once, on first sight, with its first-seen timestamp.
    Duplicate arrivals in any later micro-batch are swallowed — the
    engine-state equivalent of the reference's MERGE-on-did idempotent
    upsert (consumer_user.py:33-41). Input needs (user_did, ts).

    Ordering caveat (ADVICE r2): append-mode emit-once means the emitted
    ts is the minimum WITHIN the key's first micro-batch; an
    earlier-timestamped arrival in a later batch does not re-emit. For
    in-order streams this equals the batch global-MIN query
    (q_user_first_seen); for out-of-order streams prefer that batch
    query (or a watermarked min-agg in update mode) when the exact
    global minimum matters more than emit-once semantics."""
    return (
        events.select(
            F.col("user_did").cast("string").alias("user_did"),
            F.unix_millis("ts").alias("ts_ms"),
        )
        .groupBy("user_did")
        .applyInPandasWithState(
            _first_seen_fn,
            FIRST_SEEN_OUTPUT,
            _SEEN_STATE,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )
