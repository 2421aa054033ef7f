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

    All `value_cols` travel together as ONE struct per version row, and
    match detection is the struct's own non-nullness — never the
    nullability of the values inside it. So a version whose value is NULL
    is honored (the probe sees NULL, not a stale older value), fields
    from different versions are never mixed, and `how='inner'` keeps a
    probe whose matched version carries all-NULL values (matching DuckDB
    ASOF JOIN, which matches on the timestamp inequality alone).
    """
    from pyspark.sql.types import StructField, StructType

    probe_cols = probes.columns
    clash = [c for c in value_cols if c in probe_cols]
    if clash:
        raise ValueError(
            f"value_cols {clash} collide with probe columns; rename one side"
        )
    reserved = [c for c in ("_is_probe", "_v") if c in probe_cols]
    if reserved:
        raise ValueError(f"probe columns {reserved} are reserved names")
    v_struct = StructType(
        [StructField(c, versions.schema[c].dataType) for c in value_cols]
    )
    rest = [c for c in probe_cols if c not in (key, probe_ts)]
    p = probes.select(
        key,
        probe_ts,
        F.lit(1).alias("_is_probe"),
        F.lit(None).cast(v_struct).alias("_v"),
        *rest,
    )
    v = versions.select(
        F.col(key),
        F.col(version_ts).alias(probe_ts),
        F.lit(0).alias("_is_probe"),
        F.struct(*[F.col(c) for c in value_cols]).alias("_v"),
        *[
            F.lit(None).cast(probes.schema[c].dataType).alias(c)
            for c in rest
        ],
    )
    unioned = p.unionByName(v)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(probe_ts), F.col("_is_probe"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *[F.col(c) for c in probe_cols],
        F.col("_is_probe"),
        F.last("_v", ignorenulls=True).over(w).alias("_v"),
    )
    out = filled.where(F.col("_is_probe") == 1)
    if how == "inner":
        out = out.where(F.col("_v").isNotNull())
    elif how != "left":
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    return out.select(
        *probe_cols, *[F.col(f"_v.{c}").alias(c) for c in value_cols]
    )
