"""Mechanics checks for the round-10 catalog additions on crafted
inputs with hand-computed expectations — the synthetic tables exercise
only the generic shapes; these pin the arithmetic (the same pattern as
the c4_quality_flags / text-function micro-fixtures).

- user_jaccard_similarity: Jaccard from |∩| and set sizes on a tiny
  bipartite engagement relation.
- event_value_outliers_mad: median/MAD/outlier count on a closed-form
  value set with one planted outlier.
- event_type_markov_transitions: transition counts + row-normalized
  probabilities on a fixed per-user sequence, including the
  tied-timestamp tiebreak on event_id.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def test_user_jaccard_from_coengagement(spark):
    # users A,B share 2 posts; A has 3 distinct posts, B has 2
    # J(A,B) = 2 / (3 + 2 - 2) = 2/3 -> 0.666667 (HALF_UP 6 digits)
    from echo_chambers_detection_spark.operators.coengagement import (
        coengagement_edges_bitmap,
    )

    # numeric post ids: the bitmap kernel maps the bounded post
    # vocabulary onto integer slots (the events table's props.k shape)
    eng = spark.createDataFrame(
        [
            ("A", "1"), ("A", "2"), ("A", "3"),
            ("B", "1"), ("B", "2"),
            ("C", "3"),
        ],
        "user_did string, post_uri string",
    )
    co = coengagement_edges_bitmap(eng, num_slots=None)
    deg = eng.distinct().groupBy("user_did").agg(F.count("*").alias("deg"))
    d1 = deg.select(F.col("user_did").alias("u1"), F.col("deg").alias("deg1"))
    d2 = deg.select(F.col("user_did").alias("u2"), F.col("deg").alias("deg2"))
    rows = {
        (r["u1"], r["u2"]): (r["common"], r["jaccard"])
        for r in co.join(d1, "u1")
        .join(d2, "u2")
        .select(
            "u1",
            "u2",
            F.col("weight").alias("common"),
            F.round(
                F.col("weight")
                / (F.col("deg1") + F.col("deg2") - F.col("weight")),
                6,
            ).alias("jaccard"),
        )
        .collect()
    }
    assert rows[("A", "B")] == (2, 0.666667)
    assert rows[("A", "C")] == (1, 0.333333)  # 1 / (3 + 1 - 1)
    assert ("B", "C") not in rows  # no shared posts


def test_event_value_outliers_mad_closed_form(spark):
    # values 1..9 plus a planted 1000: median of the 10 values is 5.5,
    # |v - 5.5| = {4.5,3.5,2.5,1.5,0.5,0.5,1.5,2.5,3.5,994.5} whose
    # median (interpolated) is 2.5; gate 3*1.4826*2.5 = 11.1195 — only
    # the planted 1000 exceeds it.
    ev = spark.createDataFrame(
        [(float(v),) for v in range(1, 10)] + [(1000.0,)], "value double"
    ).select(F.lit("t").alias("event_type"), "value")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5D)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type", "med").agg(
        F.expr("percentile(adev, 0.5D)").alias("mad")
    )
    row = (
        ev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "med", "mad")
        .agg(
            F.count("*").alias("n"),
            F.sum(
                F.when(
                    F.abs(F.col("value") - F.col("med"))
                    > 3 * 1.4826 * F.col("mad"),
                    1,
                ).otherwise(0)
            ).alias("n_outliers"),
        )
        .first()
    )
    assert row["med"] == 5.5
    assert row["mad"] == 2.5
    assert row["n"] == 10
    assert row["n_outliers"] == 1


def test_markov_transitions_counts_and_probs(spark):
    from pyspark.sql.window import Window

    t0 = dt.datetime(2026, 1, 1)
    # user 1: a -> b -> a -> c   user 2: b -> a (tied ts: event_id order)
    rows = [
        (1, t0, 10, "a"),
        (1, t0 + dt.timedelta(seconds=1), 11, "b"),
        (1, t0 + dt.timedelta(seconds=2), 12, "a"),
        (1, t0 + dt.timedelta(seconds=3), 13, "c"),
        (2, t0, 20, "b"),
        (2, t0, 21, "a"),  # same ts as event 20 — id breaks the tie
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    seq = ev.select(
        "event_type",
        F.lag("event_type")
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("from_type"),
    )
    t = (
        seq.where(F.col("from_type").isNotNull())
        .groupBy("from_type", F.col("event_type").alias("to_type"))
        .agg(F.count("*").alias("n"))
    )
    got = {
        (r["from_type"], r["to_type"]): (r["n"], r["p"])
        for r in t.select(
            "from_type",
            "to_type",
            "n",
            F.round(
                F.col("n") / F.sum("n").over(Window.partitionBy("from_type")),
                6,
            ).alias("p"),
        ).collect()
    }
    # transitions: a->b, b->a (x2: user1 and user2), a->c
    assert got[("a", "b")] == (1, 0.5)
    assert got[("a", "c")] == (1, 0.5)
    assert got[("b", "a")] == (2, 1.0)
    assert len(got) == 3
