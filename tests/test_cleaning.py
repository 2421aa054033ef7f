"""Record-cleaning expression tests (functions/cleaning.py) — above all
EXACT RFC-4122 parity: uuid5_url/uuid3_url must reproduce CPython's
uuid.uuid5/uuid3 over NAMESPACE_URL bit-for-bit (VERDICT r4 #8, closing
the documented md5 substitution for the reference's make_id at
project/qdrant/consumer_post.py:56-60)."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from echo_chambers_detection_spark.functions.cleaning import (
    uuid3_url,
    uuid5_url,
)

NAMES = [
    "at://did:plc:abc/app.bsky.feed.post/3kx",
    "abc",
    "",                       # empty name is legal for uuid5
    "0",
    "post:42",
    "Ünïcode-ñame-日本語",     # multi-byte utf-8
    "a" * 300,                # long name
    "bafyreib2rxk3rh6kzwq",   # cid-ish
]


def test_uuid5_url_matches_cpython(spark):
    df = spark.createDataFrame([(s,) for s in NAMES], "name string")
    got = {
        r["name"]: r["u"]
        for r in df.select("name", uuid5_url("name").alias("u")).collect()
    }
    for s in NAMES:
        assert got[s] == str(uuid.uuid5(uuid.NAMESPACE_URL, s)), s


def test_uuid3_url_matches_cpython(spark):
    df = spark.createDataFrame([(s,) for s in NAMES], "name string")
    got = {
        r["name"]: r["u"]
        for r in df.select("name", uuid3_url("name").alias("u")).collect()
    }
    for s in NAMES:
        assert got[s] == str(uuid.uuid3(uuid.NAMESPACE_URL, s)), s


def test_uuid5_is_plain_expression(spark):
    """The whole uuid build stays JVM-side — no Python eval nodes."""
    df = spark.range(3).select(uuid5_url(F.col("id")).alias("u"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_uuid5_url_property_random_unicode(spark):
    """Property sweep: uuid5_url == CPython's uuid5 on randomly drawn
    unicode names (drawn once with a fixed seed — the engine parity is
    the property, not the sampler)."""
    import random

    rng = random.Random(20260814)
    pool = (
        "abcdefghijklmnopqrstuvwxyz0123456789:/.-_ "
        "éüß中文こんにちは"
        "\U0001f600☃"
    )
    names = [
        "".join(rng.choice(pool) for _ in range(rng.randint(1, 64)))
        for _ in range(200)
    ]
    df = spark.createDataFrame([(s,) for s in names], "name string")
    got = {
        r["name"]: r["u"]
        for r in df.select("name", uuid5_url("name").alias("u")).collect()
    }
    for s in names:
        assert got[s] == str(uuid.uuid5(uuid.NAMESPACE_URL, s)), repr(s)
