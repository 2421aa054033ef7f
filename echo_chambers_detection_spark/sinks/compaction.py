"""Write-side file compaction — the small-files fix every long-lived
parquet lake needs.

Streaming upserts and per-batch appends (streaming/ingest.py) leave a
table as thousands of tiny parquet files; at 100 TB the metadata listing
and per-file open cost then dominate every scan. The standard cure is a
periodic compaction pass that rewrites a table into files near a target
size. The reference never needed this (Postgres/Neo4j own their
storage), so it is engine infrastructure, not a parity surface — the
counterpart of what table formats call "optimize".

Sizing: the target file count comes from the plan's stats when the
source propagates them (parquet footers — no data scan), else from an
actual byte sample. `repartition(n)` (round-robin) rather than
`coalesce(n)`: coalesce merges ADJACENT partitions without a shuffle,
which preserves any skew the input had and can silently reduce upstream
parallelism; compaction is a rewrite job where the one shuffle is the
point — perfectly even output files.

Crash safety (in-place `compact_table`): the swap is two renames with a
window between them where `path` does not exist. We (a) clean or recover
any stale `.precompact`/`.compacting` siblings left by a crashed run at
entry — a `.precompact` with no live `path` IS the table and is restored,
a stale `.compacting` is a dead partial rewrite and is deleted — and
(b) roll `old` back to `path` if the second rename throws, so the only
unrecoverable outcome is a hard kill inside the kernel rename itself.
On object stores replace the rename swap with the table format's commit
protocol (this helper is the filesystem flavor).
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame


def _list_data_files(path: str, fmt: str, spark=None) -> list[tuple[str, int]]:
    """(path, size) of non-empty `*.fmt` files under `path`. Uses the
    Hadoop FileSystem API when a SparkSession is supplied — so s3a://,
    hdfs://, etc. report real counts instead of a silent 0 from a local
    glob (ADVICE r7) — with a local-glob fallback otherwise."""
    if spark is not None:
        try:
            jvm = spark._jvm
            hconf = spark._jsc.hadoopConfiguration()
            hpath = jvm.org.apache.hadoop.fs.Path(path)
            fs = hpath.getFileSystem(hconf)
            if not fs.exists(hpath):
                return []
            out = []
            for st in fs.listStatus(hpath):
                p = st.getPath()
                if st.isFile() and p.getName().endswith(f".{fmt}") and st.getLen() > 0:
                    out.append((str(p.toString()), int(st.getLen())))
            return out
        except Exception:
            pass  # fall through to local glob (e.g. mocked sessions)
    return [
        (f, os.path.getsize(f))
        for f in glob.glob(os.path.join(path, f"*.{fmt}"))
        if os.path.getsize(f) > 0
    ]


def estimate_bytes(df: DataFrame, sample_rows: int = 10_000) -> int:
    """Best-effort UNCOMPRESSED size estimate of `df` in bytes: plan
    statistics when available (free), else row count x mean row width
    of a driver-bounded head sample."""
    try:
        stats = df._jdf.queryExecution().optimizedPlan().stats()
        size = int(str(stats.sizeInBytes()))
        # Catalyst's default when it has no idea is huge (8 EiB-ish);
        # treat anything implausible as unknown
        if 0 < size < (1 << 50):
            return size
    except Exception:
        pass
    head = df.limit(sample_rows).toPandas()
    if head.empty:
        return 0
    mean_row = max(
        1, int(head.memory_usage(index=False, deep=True).sum() / len(head))
    )
    return df.count() * mean_row


def write_compacted(
    df: DataFrame,
    path: str,
    target_file_bytes: int = 128 << 20,
    compression_ratio: float = 3.0,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> int:
    """Rewrite `df` under `path` as ~target_file_bytes files; returns
    the file count written. `compression_ratio` converts the in-memory
    estimate to on-disk parquet bytes (3x is a conservative default for
    mixed text/numeric; measure per table when it matters)."""
    est = estimate_bytes(df)
    on_disk = est / max(compression_ratio, 1e-9)
    n = max(1, int(on_disk // target_file_bytes) + (1 if on_disk % target_file_bytes else 0))
    df.repartition(n).write.format(fmt).mode(mode).save(path)
    return len(_list_data_files(path, fmt, spark=df.sparkSession))


def _recover_stale(spark, path: str) -> None:
    """Entry-point recovery from a previous crashed compaction.

    - `.precompact` present while `path` is missing: the crash hit the
      swap window between the two renames — the precompact dir IS the
      table; restore it.
    - `.precompact` present alongside a live `path`: the crash hit after
      the swap completed but before cleanup; the live path is the
      compacted table and the leftover is garbage — delete it.
    - `.compacting` present: a dead partial rewrite from any crashed
      run; always delete (its contents are reproducible from `path`).
    """
    import shutil

    old = path.rstrip("/") + ".precompact"
    tmp = path.rstrip("/") + ".compacting"
    if os.path.exists(old):
        if not os.path.exists(path):
            os.rename(old, path)
        else:
            shutil.rmtree(old)
    if os.path.exists(tmp):
        shutil.rmtree(tmp)


def compact_table(
    spark,
    path: str,
    target_file_bytes: int = 128 << 20,
    fmt: str = "parquet",
) -> tuple[int, int]:
    """In-place compaction of an existing table directory: read, rewrite
    to a temp sibling at target size, atomically swap. Returns
    (files_before, files_after). Recovers from stale state left by a
    crashed prior run before doing any work (see module docstring)."""
    import shutil

    _recover_stale(spark, path)
    before = _list_data_files(path, fmt, spark=spark)
    # size from the actual files — no estimate needed for in-place work
    total = sum(sz for _, sz in before)
    n = max(1, total // target_file_bytes + (1 if total % target_file_bytes else 0))
    tmp = path.rstrip("/") + ".compacting"
    df = spark.read.format(fmt).load(path)
    df.repartition(int(n)).write.format(fmt).mode("overwrite").save(tmp)
    old = path.rstrip("/") + ".precompact"
    os.rename(path, old)
    try:
        os.rename(tmp, path)
    except BaseException:
        # roll back so `path` always exists after we return/raise; the
        # remaining exposure is a hard kill between the two renames,
        # which _recover_stale repairs on the next run
        os.rename(old, path)
        raise
    shutil.rmtree(old)
    after = _list_data_files(path, fmt, spark=spark)
    return len(before), len(after)
