"""Z-order layout (sinks/zorder.py): Morton math + measured skipping.

The evidence standard: data skipping is only real if the row-group
min/max envelopes actually shrink, so the layout test MEASURES the
per-file envelope sum on both dimensions against a single-column sort
of the same data — not just "it wrote files".
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq

from pyspark.sql import functions as F

from echo_chambers_detection_spark.sinks.zorder import (
    spread_bits,
    write_zordered,
    zorder_key,
)


def test_spread_bits_exact(spark):
    rows = (
        spark.range(0, 1 << 12)
        .select("id", spread_bits(F.col("id")).alias("s"))
        .collect()
    )
    for r in rows:
        want = 0
        v = r["id"]
        for i in range(21):
            if v >> i & 1:
                want |= 1 << (2 * i)
        assert r["s"] == want, (r["id"], r["s"], want)


def test_zorder_key_interleaves(spark):
    # (x=0b101, y=0b011) -> z bits ... y2x2 y1x1 y0x0 = 0b011011... check
    row = (
        spark.range(1)
        .select(zorder_key(F.lit(0b101), F.lit(0b011)).alias("z"))
        .first()
    )
    # x bits at even positions: 1,0,1 -> 0b010001 ; y at odd: 1,1,0 -> 0b001010
    assert row["z"] == (0b010001 | 0b001010 << 0) == 0b011011


def _envelope_sum(path: str, col: str) -> float:
    """Sum over (file, row group) of the col's max-min — proportional to
    the expected fraction of groups a uniform point predicate touches."""
    total = 0.0
    for f in glob.glob(path + "/*.parquet"):
        md = pq.ParquetFile(f).metadata
        sch = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(sch[col]).statistics
            total += float(st.max) - float(st.min)
    return total


def test_zorder_shrinks_both_envelopes(spark, tmp_path):
    # two independent uniform dimensions: a single-column sort leaves the
    # other dimension's envelopes at full range; z-order shrinks both
    n = 200_000
    df = spark.range(0, n).select(
        (F.xxhash64(F.col("id")) % 100_000).alias("a"),
        (F.xxhash64(F.col("id"), F.lit(1)) % 100_000).alias("b"),
    ).select(F.abs("a").alias("a"), F.abs("b").alias("b"))
    df = df.localCheckpoint(eager=True)

    sorted_path = str(tmp_path / "sorted_a")
    z_path = str(tmp_path / "zorder")
    (
        df.repartitionByRange(8, "a")
        .sortWithinPartitions("a")
        .write.mode("overwrite")
        .parquet(sorted_path)
    )
    write_zordered(df, z_path, ("a", "b"), n_files=8)

    assert (
        spark.read.parquet(z_path).count() == n
    )  # layout pass loses nothing
    # dimension b: sorted-by-a leaves it unclustered (envelope ~ n_groups
    # x full range); z-order must cut the sum at least 2x
    eb_sorted = _envelope_sum(sorted_path, "b")
    eb_z = _envelope_sum(z_path, "b")
    assert eb_z < eb_sorted / 2, (eb_z, eb_sorted)
    # dimension a: z-order stays clustered. With 8 files the top 3 z-key
    # bits split b 4-way and a 2-way, so the theoretical a-envelope is
    # ~4-5x the dedicated single-column sort (which is optimal for a
    # alone); unclustered would be ~8x full range = ~64x. Bound at 8x.
    ea_sorted = _envelope_sum(sorted_path, "a")
    ea_z = _envelope_sum(z_path, "a")
    assert ea_z < 8 * ea_sorted, (ea_z, ea_sorted)
