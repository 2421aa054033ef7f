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


PACK_OUTPUT = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("shard", LongType(), False),
        StructField("n_tokens", LongType(), False),
        StructField("first_chunk", LongType(), False),
        StructField("last_chunk", LongType(), False),
        StructField("n_chunks", LongType(), False),
    ]
)

_PACK_STATE = StructType([StructField("cum", LongType(), False)])


def _packing_fn_factory(budget: int):
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        cum = state.get[0] if state.exists else 0
        frames = [p for p in pdfs if len(p)]
        if not frames:
            state.update((cum,))
            return
        pdf = pd.concat(frames).sort_values("doc_id")
        firsts, lasts = [], []
        for n in pdf["n_tokens"]:
            firsts.append(cum // budget)
            cum += int(n)
            lasts.append((cum - 1) // budget)
        state.update((cum,))
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].to_numpy(),
                "shard": [key[0]] * len(pdf),
                "n_tokens": pdf["n_tokens"].to_numpy(),
                "first_chunk": firsts,
                "last_chunk": lasts,
                "n_chunks": [
                    l - f + 1 for f, l in zip(firsts, lasts)
                ],
            }
        )

    return fn


def streaming_token_packing(
    docs: DataFrame, budget: int = 2048, n_shards: int = 8
) -> DataFrame:
    """Streaming concat-and-chunk sequence packing — the stateful dual
    of catalog `token_pack_chunks`: per-shard state is ONE long (the
    running token total), each arriving document is assigned its
    first/last chunk index as it lands, and chunk ids keep growing
    across micro-batches. This is how a training-data ingest assigns
    pack positions incrementally instead of re-running a global window
    over the whole corpus per batch.

    Token counting stays a JVM expression BEFORE the stateful op (the
    Python state fn sees (doc_id, n_tokens) only). Matches the batch
    query exactly when documents arrive in doc_id order per shard (the
    batch window's ordering contract); out-of-order arrival packs in
    arrival order — the streaming-native semantics, same totals.
    Input needs (doc_id long, text string)."""
    from echo_chambers_detection_spark.functions.text import tokenize

    return (
        docs.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.size(tokenize("text")).cast("long").alias("n_tokens"),
            F.pmod(F.col("doc_id"), F.lit(n_shards))
            .cast("long")
            .alias("shard"),
        )
        .where(F.col("n_tokens") > 0)
        .groupBy("shard")
        .applyInPandasWithState(
            _packing_fn_factory(budget),
            PACK_OUTPUT,
            _PACK_STATE,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )


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


FUNNEL_OUTPUT = StructType(
    [
        StructField("user_did", StringType(), False),
        StructField("stage", LongType(), False),
        StructField("t1_ms", LongType(), True),
        StructField("t2_ms", LongType(), True),
        StructField("t3_ms", LongType(), True),
    ]
)

_FUNNEL_STATE = StructType(
    [
        StructField("stage", LongType(), False),
        StructField("t1_ms", LongType(), True),
        StructField("t2_ms", LongType(), True),
        StructField("t3_ms", LongType(), True),
    ]
)

_FUNNEL_STAGES = ("view", "click", "purchase")


def _funnel_fn(
    key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    _, t1, t2, t3 = state.get if state.exists else (0, None, None, None)
    frames = [p for p in pdfs if len(p)]
    if frames:
        pdf = pd.concat(frames)
        # three VECTORIZED min-reductions, no per-row loop: within one
        # micro-batch this is exactly the batch funnel's
        # MIN-under-strict-inequality semantics (arrival order inside
        # the batch is irrelevant)
        if t1 is None:
            views = pdf.loc[pdf["event_type"] == "view", "ts_ms"]
            if len(views):
                t1 = int(views.min())
        if t1 is not None and t2 is None:
            clicks = pdf.loc[
                (pdf["event_type"] == "click") & (pdf["ts_ms"] > t1), "ts_ms"
            ]
            if len(clicks):
                t2 = int(clicks.min())
        if t2 is not None and t3 is None:
            buys = pdf.loc[
                (pdf["event_type"] == "purchase") & (pdf["ts_ms"] > t2),
                "ts_ms",
            ]
            if len(buys):
                t3 = int(buys.min())
    stage = 3 if t3 is not None else 2 if t2 is not None else (
        1 if t1 is not None else 0
    )
    state.update((stage, t1, t2, t3))
    yield pd.DataFrame(
        {
            "user_did": [key[0]],
            "stage": [stage],
            "t1_ms": [t1],
            "t2_ms": [t2],
            "t3_ms": [t3],
        }
    )


def streaming_funnel_stages(events: DataFrame) -> DataFrame:
    """Per-user ordered-funnel state machine (view -> click ->
    purchase) — the streaming dual of the batch `event_funnel_counts`
    query: per-key state is the four scalars (stage, t1, t2, t3), each
    stage advances only on a strictly-later event of the next type,
    and the current stage is re-emitted every micro-batch the user
    appears in (update mode). Within a micro-batch the three
    vectorized min-reductions reproduce the batch query's
    MIN-under-strict-inequality semantics exactly, independent of
    arrival order; ACROSS batches the machine is emit-forward like
    `first_seen` — an earlier-timestamped stage event arriving in a
    later batch does not rewind a stage already locked (the
    streaming-native contract; in-order streams match the batch query
    bit-for-bit, and the single-batch availableNow replay used in
    tests is always exact). Input needs (user_did, event_type, ts)."""
    return (
        events.select(
            F.col("user_did").cast("string").alias("user_did"),
            F.col("event_type").cast("string").alias("event_type"),
            F.unix_millis("ts").alias("ts_ms"),
        )
        .where(F.col("event_type").isin(*_FUNNEL_STAGES))
        .groupBy("user_did")
        .applyInPandasWithState(
            _funnel_fn,
            FUNNEL_OUTPUT,
            _FUNNEL_STATE,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )


SESSION_OUTPUT = StructType(
    [
        StructField("user_did", StringType(), False),
        StructField("session_start_ms", LongType(), False),
        StructField("session_end_ms", LongType(), False),
        StructField("n_events", LongType(), False),
        StructField("closed_by", StringType(), False),  # 'gap' | 'timeout'
    ]
)

_SESSION_STATE = StructType(
    [
        StructField("start_ms", LongType(), False),
        StructField("last_ms", LongType(), False),
        StructField("n", LongType(), False),
    ]
)


def _session_fn_factory(gap_ms: int):
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            for _ in pdfs:  # drain the (empty) Arrow stream
                pass
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_did": [key[0]],
                    "session_start_ms": [start],
                    "session_end_ms": [last],
                    "n_events": [n],
                    "closed_by": ["timeout"],
                }
            )
            return
        frames = [p for p in pdfs if len(p)]
        if not frames:
            return
        pdf = pd.concat(frames).sort_values("ts_ms")
        ts = pdf["ts_ms"].to_numpy()
        # session split points WITHIN the batch (vectorized diff), then
        # merge the first batch-session into the carried open session
        # when the boundary gap allows
        import numpy as np

        brk = np.zeros(len(ts), dtype=bool)
        brk[1:] = (ts[1:] - ts[:-1]) > gap_ms
        sess = brk.cumsum()
        closed = []
        open_start = open_last = open_n = None
        if state.exists:
            open_start, open_last, open_n = state.get
        for s in range(int(sess[-1]) + 1):
            m = ts[sess == s]
            lo, hi, cnt = int(m[0]), int(m[-1]), len(m)
            if open_start is not None and lo - open_last <= gap_ms:
                # extend BOTH ends: an out-of-order batch-session
                # (within the watermark delay) can start before the
                # carried open session, and keeping the stale
                # open_start would mis-report session_start_ms
                # (ADVICE r10)
                open_start = min(open_start, lo)
                open_last, open_n = max(open_last, hi), open_n + cnt
                continue
            if open_start is not None:
                closed.append((open_start, open_last, open_n, "gap"))
            open_start, open_last, open_n = lo, hi, cnt
        state.update((open_start, open_last, open_n))
        # close when the WATERMARK passes the session's last event +
        # gap — event-time expiry, so replays are deterministic and no
        # wall clock is involved. Guard: a timer must sit strictly
        # above the current watermark (very late stragglers would
        # otherwise make set_timeout throw).
        state.setTimeoutTimestamp(
            max(open_last + gap_ms, state.getCurrentWatermarkMs() + 1)
        )
        if closed:
            yield pd.DataFrame(
                {
                    "user_did": [key[0]] * len(closed),
                    "session_start_ms": [c[0] for c in closed],
                    "session_end_ms": [c[1] for c in closed],
                    "n_events": [c[2] for c in closed],
                    "closed_by": [c[3] for c in closed],
                }
            )

    return fn


def streaming_session_stats(
    events: DataFrame, gap_ms: int = 1800_000, watermark_delay: str = "0 seconds"
) -> DataFrame:
    """Gap-based sessionization as operator state WITH state expiry —
    the `GroupStateTimeout.EventTimeTimeout` member of this module
    (the others use NoTimeout; a real ingest must also close the LAST
    session of a user who goes quiet, which only a timeout can do).
    Per-key state is three scalars (open-session start, last event,
    count); within a micro-batch sessions split on a vectorized gap
    diff; a session closes either when a later event arrives past
    `gap_ms` ('gap') or when the EVENT-TIME WATERMARK passes its last
    event + gap ('timeout' — state removed, so idle users cost
    nothing). Event-time expiry keeps the operator deterministic under
    replay: timers fire on watermark progress, never on wall clock —
    which is also why this terminates cleanly under
    trigger(availableNow) where a processing-time timer would keep the
    cleanup loop alive. Closed sessions emit in append mode. The batch
    dual is `user_session_stats` (lag-window sessionization): on
    in-order input, closed sessions match its per-session rows
    exactly; each user's final open session is the one row still in
    state until the watermark outruns it. Cross-batch OUT-OF-ORDER
    events (allowed by a nonzero watermark delay) merge on the
    interval summary — the open session's start extends backwards via
    min() — but the state holds no inner event times, so a late
    arrival that lands inside an already-summarized span cannot re-split
    it; only in-order streams carry the bit-exact batch-parity claim.
    Input needs (user_did, ts)."""
    return (
        events.select(
            F.col("user_did").cast("string").alias("user_did"),
            F.col("ts").alias("ts"),
            F.unix_millis("ts").alias("ts_ms"),
        )
        .withWatermark("ts", watermark_delay)
        .groupBy("user_did")
        .applyInPandasWithState(
            _session_fn_factory(gap_ms),
            SESSION_OUTPUT,
            _SESSION_STATE,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
