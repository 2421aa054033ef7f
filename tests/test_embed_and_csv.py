"""Tests for the embedding-inference stage (F12/G9 stub) and the CSV
source/sink (S18/S19)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F, types as T

from echo_chambers_detection_spark.operators.embed import (
    embed_texts,
    encode_batch_fake,
    encode_batch_real,
)
from echo_chambers_detection_spark.sources.tables import read_csv, write_csv


def test_embed_texts_deterministic_and_normalized(spark):
    docs = spark.createDataFrame(
        [("1", "hello world"), ("2", "hello world"), ("3", "something else"),
         ("4", None)],
        "post_cid string, text string",
    )
    out = {r["post_cid"]: r["vector"] for r in embed_texts(docs).collect()}
    assert list(out["1"]) == list(out["2"])  # same text -> same vector
    assert list(out["1"]) != list(out["3"])
    norm = sum(x * x for x in out["1"]) ** 0.5
    assert abs(norm - 1.0) < 1e-6
    assert all(x == 0.0 for x in out["4"])  # null text -> zero vector


def test_embed_cosine_tracks_token_overlap():
    a, b, c = encode_batch_fake(
        ["the quick brown fox", "the quick brown dog", "entirely different words"]
    )

    def cos(u, v):
        return sum(x * y for x, y in zip(u, v))

    assert cos(a, b) > cos(a, c)


def test_real_encoder_is_stubbed():
    with pytest.raises(NotImplementedError):
        encode_batch_real(["text"])


def test_csv_roundtrip(spark, tmp_path):
    """CSV sink/source with explicit schema — the reference's
    {algo}_clusters.csv artifact shape (SURVEY.md S18/S19)."""
    labels = spark.createDataFrame(
        [("n1", 0), ("n2", 0), ("n3", 1)], "neo4jId string, label int"
    )
    path = str(tmp_path / "clusters")
    write_csv(labels, path)
    schema = T.StructType(
        [
            T.StructField("neo4jId", T.StringType()),
            T.StructField("label", T.IntegerType()),
        ]
    )
    back = read_csv(spark, path, schema)
    assert sorted(tuple(r) for r in back.collect()) == [
        ("n1", 0), ("n2", 0), ("n3", 1)
    ]


def test_encode_batch_real_lights_up_with_library():
    """Import-guarded seam (VERDICT r2 #7): runs real
    sentence-transformers inference when installed; skipped in the
    shipping container."""
    import pytest

    pytest.importorskip("sentence_transformers")
    from echo_chambers_detection_spark.operators.embed import (
        encode_batch_real,
    )

    vecs = encode_batch_real(["hello world", "hello world"])
    assert len(vecs) == 2 and vecs[0] == vecs[1] and len(vecs[0]) > 0


def test_encode_batch_real_raises_cleanly_without_library():
    try:
        import sentence_transformers  # noqa: F401

        import pytest

        pytest.skip("library present — covered by the light-up test")
    except ImportError:
        pass
    import pytest

    from echo_chambers_detection_spark.operators.embed import (
        encode_batch_real,
    )

    with pytest.raises(NotImplementedError, match="sentence-transformers"):
        encode_batch_real(["x"])
