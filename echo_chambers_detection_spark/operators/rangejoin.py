"""Bucketized interval (range) join — the temporal primitive next to
`operators/asof.py` (SURVEY.md W2 superset; the prompt-level operator
family: as-of join, range join).

An inner join on `ts BETWEEN start AND end` has no equi-key for the
hash-join planner: Spark falls back to broadcast-nested-loop (explodes
on the probe side) or an O(|intervals| x |probes-per-key|) sort-merge.
The standard distributed strategy — what Databricks' range-join hints
and every time-series engine do — is BUCKETIZATION:

- each probe lands in exactly ONE time bucket (floor(ts / bucket));
- each interval replicates to every bucket it overlaps
  (ceil(duration / bucket) + 1 rows);
- the join becomes an equi-join on (key?, bucket) followed by the exact
  range predicate.

Shuffle keys on (key, bucket), never on the cross product. Costs and
knobs at 100 TB:
- interval replication is O(duration / bucket) rows per interval —
  `bucket_ms` trades replication against per-bucket pair volume;
- a probe is never duplicated (single bucket), so the output needs no
  dedup;
- hot buckets (burst hours) are ordinary AQE skew-join territory.

Open-ended intervals (`end` NULL — SCD-2 current rows) are capped at
max(probe ts) + 1 via a one-row broadcast: beyond the last probe no
bucket can match, so the cap loses nothing and bounds replication.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


_RESERVED = ("_b", "_end", "_maxts")


def interval_join(
    probes: DataFrame,
    intervals: DataFrame,
    probe_ts: str,
    start_col: str,
    end_col: str,
    key: str | None = None,
    bucket_ms: int = 86_400_000,
    cap_ts: int | None = None,
) -> DataFrame:
    """Inner-join probe rows onto the intervals containing them:
    `start <= ts < end` (half-open, the SCD-2 validity convention),
    plus `key` equality when given. Timestamps are epoch-ms longs.

    Returns all probe columns + all interval columns (the caller
    projects). NULL `end` means open-ended (capped, see module doc);
    empty intervals (`end <= start`) match nothing by definition and
    are dropped before bucketing (they would otherwise make
    F.sequence step backwards).

    `cap_ts`: exclusive upper bound for open-ended intervals. When
    omitted it is derived as max(probe ts) + 1, which EXECUTES THE
    PROBES PLAN TWICE (once for the aggregate, once for the join) —
    callers with an expensive probe plan should pass a known bound
    (any value > the last probe timestamp is lossless) or cache the
    probes frame first (ADVICE r5)."""
    for side, frame in (("probes", probes), ("intervals", intervals)):
        clash = [c for c in frame.columns if c in _RESERVED]
        if clash:
            raise ValueError(
                f"interval_join reserves column names {_RESERVED}; "
                f"{side} input already has {clash} — rename them first"
            )
    if cap_ts is not None:
        iv = intervals.withColumn(
            "_end", F.coalesce(F.col(end_col), F.lit(int(cap_ts)))
        )
    else:
        maxp = probes.agg((F.max(probe_ts) + F.lit(1)).alias("_maxts"))
        iv = intervals.crossJoin(F.broadcast(maxp)).withColumn(
            "_end", F.coalesce(F.col(end_col), F.col("_maxts"))
        )
    iv = iv.where(F.col("_end") > F.col(start_col))
    ivb = iv.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / bucket_ms),
                F.floor((F.col("_end") - 1) / bucket_ms),
            )
        ),
    )
    pb = probes.withColumn("_b", F.floor(F.col(probe_ts) / bucket_ms))
    # name-list join merges _b (and key) across sides; any OTHER shared
    # column name between probes and intervals is the caller's to
    # rename first
    on = ["_b"] if key is None else ["_b", key]
    joined = pb.join(ivb, on).where(
        (F.col(probe_ts) >= F.col(start_col))
        & (F.col(probe_ts) < F.col("_end"))
    )
    return joined.drop("_b", "_end", "_maxts")
