"""Write-side compaction sink (sinks/compaction.py): small-files cure.
Correctness = row-identical data, file count near the byte target."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from echo_chambers_detection_spark.sinks.compaction import (
    compact_table,
    estimate_bytes,
    write_compacted,
)


def test_write_compacted_hits_file_target(spark, tmp_path):
    df = spark.range(0, 20_000).select(
        "id", F.md5(F.col("id").cast("string")).alias("payload")
    )
    out = str(tmp_path / "t1")
    # ~20k rows x ~40B ≈ 800KB memory; 3x ratio -> ~266KB disk;
    # 64KB target -> a handful of files, never 1, never hundreds
    n = write_compacted(df, out, target_file_bytes=64 << 10)
    assert 2 <= n <= 32, n
    back = spark.read.parquet(out)
    assert back.count() == 20_000
    assert back.agg(F.sum("id")).first()[0] == sum(range(20_000))


def test_compact_table_in_place_reduces_files(spark, tmp_path):
    path = str(tmp_path / "t2")
    df = spark.range(0, 5_000).select(
        "id", F.md5(F.col("id").cast("string")).alias("payload")
    )
    # simulate streaming-append fragmentation: 64 tiny files
    df.repartition(64).write.parquet(path)
    frag = len(glob.glob(os.path.join(path, "*.parquet")))
    assert frag >= 32
    before, after = compact_table(spark, path, target_file_bytes=8 << 20)
    assert before == frag
    assert after < before / 8
    back = spark.read.parquet(path)
    assert back.count() == 5_000
    assert back.agg(F.sum("id")).first()[0] == sum(range(5_000))
    assert not os.path.exists(path + ".precompact")
    assert not os.path.exists(path + ".compacting")


def test_estimate_bytes_plausible(spark):
    df = spark.range(0, 1_000).select(
        "id", F.md5(F.col("id").cast("string")).alias("pad")
    )
    est = estimate_bytes(df)
    # 1000 rows x (8B id + a string column): Catalyst prices synthetic
    # strings at a fixed ~10B width (observed 18B/row total), the pandas
    # deep-memory fallback much higher — the plausibility window only
    # rejects nonsense (zero, or the 8 EiB unknown-stats default)
    assert 10_000 <= est < 5_000_000, est


def test_compact_table_recovers_stale_state(spark, tmp_path):
    # .compacting left by a crashed rewrite + .precompact alongside a
    # live table: both are garbage; compaction cleans them and proceeds
    path = str(tmp_path / "t3")
    df = spark.range(0, 2_000).select(
        "id", F.md5(F.col("id").cast("string")).alias("payload")
    )
    df.repartition(16).write.parquet(path)
    os.makedirs(path + ".compacting")
    with open(path + ".compacting" + "/junk.parquet", "w") as f:
        f.write("dead partial rewrite")
    os.makedirs(path + ".precompact")
    before, after = compact_table(spark, path, target_file_bytes=8 << 20)
    assert before == 16 and after < before
    assert not os.path.exists(path + ".precompact")
    assert not os.path.exists(path + ".compacting")
    assert spark.read.parquet(path).count() == 2_000


def test_compact_table_restores_table_lost_in_swap_window(spark, tmp_path):
    # crash BETWEEN the two renames leaves only .precompact — the next
    # run must restore it as the table before compacting
    path = str(tmp_path / "t4")
    df = spark.range(0, 1_000).select("id")
    df.repartition(8).write.parquet(path)
    os.rename(path, path + ".precompact")  # simulate the crash window
    assert not os.path.exists(path)
    before, after = compact_table(spark, path, target_file_bytes=8 << 20)
    assert before == 8 and after <= before
    assert spark.read.parquet(path).agg(F.sum("id")).first()[0] == sum(
        range(1_000)
    )
