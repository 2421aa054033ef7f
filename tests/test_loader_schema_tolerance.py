"""load_table timestamp tolerance: the driver regenerates /root/testdata
between rounds and has already switched events.ts between
TIMESTAMP(NANOS)-as-long and native TIMESTAMP(MICROS) once (round 1 -> 2).
Pin that both encodings load to TIMESTAMP with identical epoch values."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from echo_chambers_detection_spark.sources.tables import load_table


def _write_events(path: str, ts_array: pa.Array) -> None:
    table = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([10, 11], pa.int64()),
            "event_type": pa.array(["a", "b"]),
            "value": pa.array([1.0, 2.0]),
            "props": pa.array(["{}", "{}"]),
        }
    )
    pq.write_table(table, path)


EPOCH_US = [1_700_000_000_000_000, 1_700_000_123_456_000]


def test_native_micros_and_long_nanos_load_identically(spark, tmp_path):
    d_us = tmp_path / "us"
    d_ns = tmp_path / "ns"
    os.makedirs(d_us)
    os.makedirs(d_ns)
    _write_events(
        str(d_us / "events.parquet"), pa.array(EPOCH_US, pa.timestamp("us"))
    )
    _write_events(
        str(d_ns / "events.parquet"),
        pa.array([v * 1000 for v in EPOCH_US], pa.timestamp("ns")),
    )
    rows = {}
    for tag, d in (("us", d_us), ("ns", d_ns)):
        df = load_table(spark, "events", str(d))
        assert dict(df.dtypes)["ts"] == "timestamp", (tag, df.dtypes)
        rows[tag] = sorted(
            (r["event_id"], r["ts"]) for r in df.select("event_id", "ts").collect()
        )
    assert rows["us"] == rows["ns"]
