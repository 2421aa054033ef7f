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


def _solid_png(w, h, rgb):
    """CRC-valid PNG bytes via the chart sink's stdlib encoder."""
    import numpy as np

    from echo_chambers_detection_spark.sinks.charts import _png_encode

    return _png_encode(
        np.asarray([[list(rgb)] * w for _ in range(h)], dtype=np.uint8)
    )


def test_decode_image_real_executes_in_container():
    """VERDICT r6 #6: decode_image_real runs HERE — pillow if present,
    else the vendored stdlib PNG reader — on real encoded bytes."""
    from echo_chambers_detection_spark.operators.multimodal import (
        decode_image_real,
    )

    w, h, c, mean = decode_image_real(_solid_png(8, 4, (10, 20, 30)))
    assert (w, h, c) == (8, 4, 3)
    assert abs(mean - 20.0) < 0.01


def test_vendored_png_filters_and_color_types():
    """The vendored decoder handles every scanline filter (exercised by
    round-tripping non-uniform pixels through zlib at max effort) and
    the gray/RGBA/palette color types."""
    import struct
    import zlib

    from echo_chambers_detection_spark.functions.imagecodec import (
        decode_image_bytes,
        decode_png,
    )
    from echo_chambers_detection_spark.sinks.charts import _png_encode

    # gradient image: filter choice varies per scanline in real encoders
    rgb = [
        [[(x * 7 + y * 13) % 256, (x * 3) % 256, (y * 5) % 256]
         for x in range(32)]
        for y in range(16)
    ]
    import numpy as np

    w, h, c, mean = decode_image_bytes(
        _png_encode(np.asarray(rgb, dtype=np.uint8))
    )
    flat = [ch for row in rgb for px in row for ch in px]
    assert (w, h, c) == (32, 16, 3)
    assert abs(mean - sum(flat) / len(flat)) < 1e-9

    # hand-build each filter type on a 3x2 grayscale PNG
    def chunk(tag, data):
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    for ftype in range(5):
        rows = b""
        for y in range(2):
            rows += bytes([ftype]) + bytes([10 * (y + 1)] * 3) if ftype == 0 \
                else bytes([ftype, 10 * (y + 1), 0, 0]) if ftype in (1, 2) \
                else bytes([ftype, 10 * (y + 1), 5, 5])
        png = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 2, 8, 0, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(rows))
            + chunk(b"IEND", b"")
        )
        got_w, got_h, got_c, _ = decode_png(png)
        assert (got_w, got_h, got_c) == (3, 2, 3), f"filter {ftype}"

    # palette PNG: 2 indices -> PLTE lookup
    plte = bytes([255, 0, 0, 0, 0, 255])
    rows = b"\x00" + bytes([0, 1, 0]) + b"\x00" + bytes([1, 1, 1])
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", plte)
        + chunk(b"IDAT", zlib.compress(rows))
        + chunk(b"IEND", b"")
    )
    w, h, c, mean = decode_png(png)
    # 2 red + 4 blue pixels, each summing to 255 over 3 channels
    assert (w, h, c) == (3, 2, 3) and abs(mean - 255 / 3) < 1e-9


def test_vendored_bmp_and_unsupported_format():
    import struct

    import pytest

    from echo_chambers_detection_spark.functions.imagecodec import (
        decode_image_bytes,
    )

    # 2x2 24-bit bottom-up BMP, solid (10, 20, 30) -> stride pads to 8
    row = bytes([30, 20, 10] * 2) + b"\x00\x00"
    bmp = (
        b"BM" + struct.pack("<IHHI", 54 + 16, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, 16, 0, 0, 0, 0)
        + row * 2
    )
    w, h, c, mean = decode_image_bytes(bmp)
    assert (w, h, c) == (2, 2, 3) and abs(mean - 20.0) < 1e-9

    with pytest.raises(NotImplementedError, match="pillow"):
        decode_image_bytes(b"\xff\xd8\xffJPEGish")


def test_decode_images_auto_routes_real_and_stub(spark):
    """decoder='auto' without pillow: PNG payloads take the vendored
    real path, non-image payloads fall back to the stub."""
    from echo_chambers_detection_spark.operators.multimodal import (
        decode_image_stub,
        decode_images,
    )

    png = _solid_png(8, 4, (10, 20, 30))
    fake = b"not-an-image-payload" * 3
    df = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(fake))],
        "doc_id long, payload binary",
    )
    out = {r["doc_id"]: r for r in decode_images(df, decoder="auto").collect()}
    try:
        import PIL  # noqa: F401
    except ImportError:
        sw, sh, sc, sm = decode_image_stub(fake)
        assert (out[2]["width"], out[2]["height"]) == (sw, sh)
    assert (out[1]["width"], out[1]["height"], out[1]["n_channels"]) == (8, 4, 3)
    assert abs(out[1]["mean_pixel"] - 20.0) < 0.01


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


def test_vendored_wav_decode_roundtrip():
    """Stdlib WAV: encode a known sine-ish PCM16 signal, decode, and
    check the closed-form RMS (square wave amplitude a -> rms a)."""
    from echo_chambers_detection_spark.functions.audiocodec import (
        decode_wav,
        encode_wav_pcm16,
    )

    amp = 16384  # half scale -> rms 0.5
    samples = [amp if i % 2 == 0 else -amp for i in range(8000)]
    wav = encode_wav_pcm16(samples, sample_rate=16_000)
    c, r, n, dur, rms = decode_wav(wav)
    assert (c, r, n) == (1, 16_000, 8000)
    assert abs(dur - 0.5) < 1e-9
    assert abs(rms - 0.5) < 1e-6


def test_wav_unsupported_format_raises():
    import struct

    import pytest

    from echo_chambers_detection_spark.functions.audiocodec import (
        decode_wav,
        encode_wav_pcm16,
    )

    wav = bytearray(encode_wav_pcm16([0] * 4))
    # flip the fmt audio-format field to ADPCM (2)
    fmt_off = wav.index(b"fmt ") + 8
    wav[fmt_off:fmt_off + 2] = struct.pack("<H", 2)
    with pytest.raises(NotImplementedError, match="codec"):
        decode_wav(bytes(wav))


def test_decode_audio_auto_routes(spark):
    from echo_chambers_detection_spark.functions.audiocodec import (
        encode_wav_pcm16,
    )
    from echo_chambers_detection_spark.operators.multimodal import (
        decode_audio,
        decode_audio_stub,
    )

    wav = encode_wav_pcm16([8192] * 1600, sample_rate=16_000)
    fake = b"definitely-not-audio" * 4
    df = spark.createDataFrame(
        [(1, bytearray(wav)), (2, bytearray(fake))],
        "doc_id long, payload binary",
    )
    out = {r["doc_id"]: r for r in decode_audio(df).collect()}
    assert out[1]["sample_rate"] == 16_000
    assert out[1]["n_samples"] == 1600
    assert abs(out[1]["rms"] - 0.25) < 1e-6
    sc, sr, sn, sd, srms = decode_audio_stub(fake)
    assert out[2]["n_samples"] == sn and out[2]["sample_rate"] == sr


def test_vendored_y4m_decode_roundtrip():
    from echo_chambers_detection_spark.functions.videocodec import (
        decode_y4m,
        encode_y4m,
        sniff_y4m,
    )

    frames = [bytes([v]) * (16 * 8) for v in (10, 20, 30, 40, 50)]
    y4m = encode_y4m(frames, 16, 8, fps=(30, 1))
    assert sniff_y4m(y4m)
    w, h, fps, nf, ns, luma = decode_y4m(y4m)
    assert (w, h, fps, nf, ns) == (16, 8, 30.0, 5, 5)
    assert luma == pytest.approx(30.0)  # mean of 10..50
    # stride 2 samples frames 0, 2, 4 -> mean of 10, 30, 50
    w, h, fps, nf, ns, luma = decode_y4m(y4m, frame_stride=2)
    assert (nf, ns) == (5, 3)
    assert luma == pytest.approx(30.0)


def test_y4m_colorspaces_and_errors():
    from echo_chambers_detection_spark.functions.videocodec import (
        decode_y4m,
        encode_y4m,
    )

    y = bytes(range(64)) * 2  # 16x8 plane
    for cs, want_luma in (
        ("C420jpeg", 31.5),
        ("C422", 31.5),
        ("C444", 31.5),
        ("Cmono", 31.5),
    ):
        out = decode_y4m(encode_y4m([y], 16, 8, colorspace=cs))
        assert out[:2] == (16, 8), cs
        assert out[5] == pytest.approx(want_luma), cs
    with pytest.raises(NotImplementedError, match="signature"):
        decode_y4m(b"\x00\x00\x00\x18ftypmp42" + b"\x00" * 64)  # MP4
    with pytest.raises(NotImplementedError, match="unsupported"):
        decode_y4m(b"YUV4MPEG2 W4 H4 F25:1 C411\nFRAME\n" + b"\x00" * 24)
    truncated = encode_y4m([y], 16, 8)[:-10]
    with pytest.raises(NotImplementedError, match="truncated"):
        decode_y4m(truncated)


def test_decode_video_auto_routes_and_strides(spark):
    from echo_chambers_detection_spark.functions.videocodec import (
        encode_y4m,
    )
    from echo_chambers_detection_spark.operators.multimodal import (
        decode_video,
        decode_video_stub,
    )

    frames = [bytes([100 + f]) * (16 * 8) for f in range(6)]
    y4m = encode_y4m(frames, 16, 8)
    fake = b"definitely-not-video" * 8
    df = spark.createDataFrame(
        [(1, bytearray(y4m)), (2, bytearray(fake))],
        "doc_id long, payload binary",
    )
    out = {
        r["doc_id"]: r
        for r in decode_video(df, frame_stride=3).collect()
    }
    assert (out[1]["width"], out[1]["height"]) == (16, 8)
    assert (out[1]["n_frames"], out[1]["n_sampled"]) == (6, 2)
    # frames 0 and 3 sampled -> mean of 100 and 103
    assert out[1]["mean_luma"] == pytest.approx(101.5)
    sw, sh, sfps, snf, sns, sluma = decode_video_stub(fake, frame_stride=3)
    assert out[2]["n_frames"] == snf and out[2]["n_sampled"] == sns
    import pytest as _pt

    with _pt.raises(ValueError, match="decoder"):
        decode_video(df, decoder="ffmpeg")


def test_y4m_odd_dimensions_use_ceiling_chroma_planes():
    # real C420/C422 planes are 2*ceil(w/2)*ceil(h/2) / 2*ceil(w/2)*h;
    # an int(y_size*factor) floor mis-advances the cursor on odd dims
    # and rejects valid multi-frame streams (ADVICE r7)
    from echo_chambers_detection_spark.functions.videocodec import (
        decode_y4m,
        encode_y4m,
    )

    for w, h, cs in [(5, 3, "C420jpeg"), (5, 3, "C422"), (7, 5, "C422"),
                     (3, 7, "C420jpeg"), (5, 4, "C422")]:
        frames = [bytes([v]) * (w * h) for v in (100, 200)]
        y4m = encode_y4m(frames, w, h, colorspace=cs)
        got = decode_y4m(y4m)
        assert got[0] == w and got[1] == h, (w, h, cs)
        assert got[3] == 2 and got[4] == 2, (w, h, cs)
        assert got[5] == pytest.approx(150.0), (w, h, cs)
