"""Point-in-time (as-of) join — the training-pipeline temporal primitive.

The reference's only temporal read is the SCD-2 `as_of` predicate over
community_membership (project/db/postgres.py:50-57, SURVEY.md W2): one
timestamp for the whole query. A feature pipeline needs the general form —
attach to EVERY probe row (an event, a training example) the dimension
version that was valid at that row's own timestamp.

Spark-first design: NOT a range join. A range join on
(key, ts BETWEEN valid_from AND valid_to) explodes into a broadcast
nested-loop or an O(intervals x probes-per-key) sort-merge. Instead:
union probes and versions into one keyed stream and take
`last(value, ignorenulls=True)` over a (key) window ordered by
(ts, is_version_first) — exactly one shuffle on the key, linear in
|probes| + |versions|, no skew beyond key activity. This is the same
plan shape DuckDB/kdb execute ASOF JOIN with, and it survives 100 TB
because it is a single partition-by-key sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def asof_join(
    probes: DataFrame,
    versions: DataFrame,
    key: str,
    probe_ts: str,
    version_ts: str,
    value_cols: list[str],
    how: str = "inner",
) -> DataFrame:
    """For each probe row, attach the latest version row of the same key
    with `version_ts` <= `probe_ts` (ties: the version wins, so a probe
    exactly at a version boundary sees that version — DuckDB ASOF JOIN
    `>=` semantics).

    Returns all probe columns plus `value_cols`. `how='inner'` drops
    probes with no preceding version; `'left'` keeps them with nulls.
    """
    probe_cols = probes.columns
    p = probes.withColumn("_is_probe", F.lit(1))
    for c in value_cols:
        p = p.withColumn(c, F.lit(None).cast(versions.schema[c].dataType))
    v = versions.select(
        F.col(key),
        F.col(version_ts).alias(probe_ts),
        *[F.col(c) for c in value_cols],
    ).withColumn("_is_probe", F.lit(0))
    for c in probe_cols:
        if c not in (key, probe_ts):
            v = v.withColumn(c, F.lit(None).cast(probes.schema[c].dataType))
    unioned = p.select(
        key, probe_ts, "_is_probe", *value_cols,
        *[c for c in probe_cols if c not in (key, probe_ts)],
    ).unionByName(
        v.select(
            key, probe_ts, "_is_probe", *value_cols,
            *[c for c in probe_cols if c not in (key, probe_ts)],
        )
    )
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(probe_ts), F.col("_is_probe"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *[F.col(c) for c in probe_cols],
        F.col("_is_probe"),
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in value_cols],
    )
    out = filled.where(F.col("_is_probe") == 1).drop("_is_probe")
    if how == "inner":
        cond = None
        for c in value_cols:
            nn = F.col(c).isNotNull()
            cond = nn if cond is None else (cond | nn)
        out = out.where(cond)
    elif how != "left":
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    return out
