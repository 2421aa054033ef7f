"""Z-order (Morton-curve) data layout — multi-column data skipping.

Sorting a table by ONE column gives parquet row-group min/max pruning on
that column only; interleaving the bits of two (or more) key columns and
sorting by the result clusters the data on BOTH, so predicates on either
column skip most row groups. This is the layout pass behind every lake
engine's "OPTIMIZE ZORDER BY" — at 100 TB it is the difference between
scanning a whole table and touching a few percent of its files for
selective multi-dimension queries.

Everything here is JVM expressions: the bit spread is the classic
magic-number interleave (5 shift-or-mask steps per column, unrolled into
one codegen-able expression), the write is a range-partitioned sort so
output files tile the curve. No Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# 21 bits per dimension: 2 dims fit a 42-bit Morton code in a long with
# headroom; values must be pre-scaled to [0, 2^21) by the rank/bucket
# step below.
_BITS = 21

# magic-number bit spread: every bit of a 32-bit value to the even
# positions of a 64-bit value (the standard 2-D Morton LUT-free
# construction)
_SPREAD_STEPS = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)


def spread_bits(col: Column) -> Column:
    """Spread the low 21 bits of `col` so bit i lands at position 2*i
    (one JVM expression chain, whole-stage-codegen friendly)."""
    x = col.cast("long").bitwiseAND(F.lit((1 << _BITS) - 1))
    for shift, mask in _SPREAD_STEPS:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def zorder_key(c1: Column, c2: Column) -> Column:
    """Morton-interleave two pre-scaled [0, 2^21) integer columns."""
    return spread_bits(c1).bitwiseOR(F.shiftleft(spread_bits(c2), 1))


def _to_bucket(col: Column, lo: Column, hi: Column) -> Column:
    """Affine-map a numeric column into [0, 2^21) given min/max bounds."""
    span = F.greatest(hi - lo, F.lit(1e-300))
    scaled = ((col - lo) / span) * F.lit((1 << _BITS) - 1)
    return F.least(
        F.greatest(scaled.cast("long"), F.lit(0)),
        F.lit((1 << _BITS) - 1),
    )


def write_zordered(
    df: DataFrame,
    path: str,
    cols: tuple[str, str],
    n_files: int = 8,
    fmt: str = "parquet",
) -> None:
    """Rewrite `df` Z-ordered on two numeric columns: per-column bounds
    from one cheap agg, bucketize, Morton-interleave, range-partition
    sort on the key, drop the key. `repartitionByRange` + in-partition
    sort means each output file covers a contiguous curve segment, so
    every file's min/max envelope is tight on BOTH columns."""
    c1, c2 = cols
    b = df.agg(
        F.min(c1).alias("lo1"), F.max(c1).alias("hi1"),
        F.min(c2).alias("lo2"), F.max(c2).alias("hi2"),
    ).first()
    key = zorder_key(
        _to_bucket(F.col(c1), F.lit(b["lo1"]), F.lit(b["hi1"])),
        _to_bucket(F.col(c2), F.lit(b["lo2"]), F.lit(b["hi2"])),
    )
    (
        df.withColumn("_z", key)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .format(fmt)
        .save(path)
    )
