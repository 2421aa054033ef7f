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
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame


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
    return len(
        [
            f
            for f in glob.glob(os.path.join(path, f"*.{fmt}"))
            if os.path.getsize(f) > 0
        ]
    )


def compact_table(
    spark,
    path: str,
    target_file_bytes: int = 128 << 20,
    fmt: str = "parquet",
) -> tuple[int, int]:
    """In-place compaction of an existing table directory: read, rewrite
    to a temp sibling at target size, atomically swap. Returns
    (files_before, files_after).

    The swap is rename-based — on object stores replace this with the
    table format's commit protocol (this helper is the filesystem
    flavor)."""
    before = [
        f
        for f in glob.glob(os.path.join(path, f"*.{fmt}"))
        if os.path.getsize(f) > 0
    ]
    # size from the actual files — no estimate needed for in-place work
    total = sum(os.path.getsize(f) for f in before)
    n = max(1, total // target_file_bytes + (1 if total % target_file_bytes else 0))
    tmp = path.rstrip("/") + ".compacting"
    df = spark.read.format(fmt).load(path)
    df.repartition(int(n)).write.format(fmt).mode("overwrite").save(tmp)
    old = path.rstrip("/") + ".precompact"
    os.rename(path, old)
    os.rename(tmp, path)
    import shutil

    shutil.rmtree(old)
    after = [
        f
        for f in glob.glob(os.path.join(path, f"*.{fmt}"))
        if os.path.getsize(f) > 0
    ]
    return len(before), len(after)
