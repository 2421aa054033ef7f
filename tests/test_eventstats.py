"""interarrival_gap_stats edge semantics: tie-breaks, single-event
users, and the exact-sum discipline (catalog query
`event_interarrival_stats`; at-scale twin `bench_interarrival_lag_10m`
with a closed-form oracle)."""

from __future__ import annotations

from echo_chambers_detection_spark.operators.eventstats import (
    interarrival_gap_stats,
)


def _ev(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, event_type string",
    )


def test_gaps_attribute_to_later_event_type(spark):
    import datetime as dt

    t0 = dt.datetime(2026, 1, 1)
    rows = [
        (1, 1, t0, "a"),
        (2, 1, t0 + dt.timedelta(seconds=2), "b"),
        (3, 1, t0 + dt.timedelta(seconds=5), "a"),
    ]
    got = {
        r["event_type"]: r
        for r in interarrival_gap_stats(_ev(spark, rows)).collect()
    }
    # the 2s gap belongs to 'b' (the later event), the 3s gap to 'a'
    assert got["b"]["n_gaps"] == 1 and got["b"]["sum_gap_ms"] == 2000
    assert got["a"]["n_gaps"] == 1 and got["a"]["sum_gap_ms"] == 3000
    assert got["a"]["avg_gap_s"] == 3.0


def test_single_event_users_contribute_no_gap(spark):
    import datetime as dt

    t0 = dt.datetime(2026, 1, 1)
    rows = [(1, 1, t0, "a"), (2, 2, t0, "a"), (3, 3, t0, "a")]
    assert interarrival_gap_stats(_ev(spark, rows)).count() == 0


def test_tied_timestamps_break_by_event_id(spark):
    import datetime as dt

    t0 = dt.datetime(2026, 1, 1)
    # two events at the SAME instant: the event_id tie-break pins the
    # order (1 then 2), so the zero gap lands on event 2's type and the
    # 1s gap on event 3's — regardless of physical row order
    rows = [
        (2, 1, t0, "y"),
        (1, 1, t0, "x"),
        (3, 1, t0 + dt.timedelta(seconds=1), "z"),
    ]
    got = {
        r["event_type"]: r
        for r in interarrival_gap_stats(_ev(spark, rows)).collect()
    }
    assert "x" not in got  # first event in user order: no gap
    assert got["y"]["sum_gap_ms"] == 0 and got["y"]["n_gaps"] == 1
    assert got["z"]["sum_gap_ms"] == 1000


def test_gaps_never_cross_users(spark):
    import datetime as dt

    t0 = dt.datetime(2026, 1, 1)
    rows = [
        (1, 1, t0, "a"),
        (2, 2, t0 + dt.timedelta(seconds=100), "a"),
    ]
    # two users with one event each — a cross-user gap would invent one
    assert interarrival_gap_stats(_ev(spark, rows)).count() == 0
