"""Bucketized interval join (operators/rangejoin.py): containment
semantics, open-end capping, empty-interval drop, keyless mode, and
bucket-width invariance (the knob must never change results)."""

from __future__ import annotations

from echo_chambers_detection_spark.operators.rangejoin import interval_join


def _probes(spark):
    return spark.createDataFrame(
        [("u1", 5), ("u1", 10), ("u1", 99), ("u2", 10), ("u2", 250)],
        "k string, ts long",
    )


def _intervals(spark):
    return spark.createDataFrame(
        [
            ("u1", "a", 0, 10),      # [0,10): catches ts=5 only
            ("u1", "b", 10, None),   # open end: catches 10 and 99
            ("u2", "c", 200, 200),   # empty: catches nothing
            ("u2", "d", 5, 20),      # catches ts=10
        ],
        "k string, v string, s long, e long",
    )


def test_interval_join_semantics_and_open_end(spark):
    got = {
        (r["k"], r["ts"], r["v"])
        for r in interval_join(
            _probes(spark), _intervals(spark),
            probe_ts="ts", start_col="s", end_col="e", key="k",
            bucket_ms=7,
        ).collect()
    }
    assert got == {
        ("u1", 5, "a"),
        ("u1", 10, "b"),
        ("u1", 99, "b"),
        ("u2", 10, "d"),
    }
    # u2 ts=250 matches nothing: the only open-ended interval is u1's


def test_interval_join_bucket_width_invariance(spark):
    want = None
    for bucket in (1, 3, 7, 1000, 10_000):
        got = sorted(
            (r["k"], r["ts"], r["v"])
            for r in interval_join(
                _probes(spark), _intervals(spark),
                probe_ts="ts", start_col="s", end_col="e", key="k",
                bucket_ms=bucket,
            ).collect()
        )
        if want is None:
            want = got
        assert got == want, bucket


def test_interval_join_reserved_names_raise(spark):
    import pytest

    bad = spark.createDataFrame([("u1", 5, 1)], "k string, ts long, _b long")
    with pytest.raises(ValueError, match="_b"):
        interval_join(
            bad, _intervals(spark),
            probe_ts="ts", start_col="s", end_col="e", key="k",
        )
    bad_iv = spark.createDataFrame(
        [("u1", 0, 10, 3)], "k string, s long, e long, _end long"
    )
    with pytest.raises(ValueError, match="_end"):
        interval_join(
            _probes(spark), bad_iv,
            probe_ts="ts", start_col="s", end_col="e", key="k",
        )


def test_interval_join_cap_ts_matches_derived(spark):
    """A caller-supplied cap > max probe ts is lossless (ADVICE r5:
    avoids executing the probes plan twice)."""
    want = sorted(
        (r["k"], r["ts"], r["v"])
        for r in interval_join(
            _probes(spark), _intervals(spark),
            probe_ts="ts", start_col="s", end_col="e", key="k",
            bucket_ms=7,
        ).collect()
    )
    got = sorted(
        (r["k"], r["ts"], r["v"])
        for r in interval_join(
            _probes(spark), _intervals(spark),
            probe_ts="ts", start_col="s", end_col="e", key="k",
            bucket_ms=7, cap_ts=1_000,
        ).collect()
    )
    assert got == want


def test_interval_join_keyless(spark):
    probes = spark.createDataFrame([(5,), (15,), (25,)], "ts long")
    iv = spark.createDataFrame(
        [("x", 0, 10), ("y", 10, 20)], "v string, s long, e long"
    )
    got = {
        (r["ts"], r["v"])
        for r in interval_join(
            probes, iv, probe_ts="ts", start_col="s", end_col="e",
            bucket_ms=4,
        ).collect()
    }
    assert got == {(5, "x"), (15, "y")}
