"""Multimodal column plumbing (BASELINE.json north star / SURVEY.md M6).

Images/audio/video ride through the engine as opaque `binary` payload
columns with typed metadata; transforms (decode, resize, frame-sample,
feature-extract) are Arrow-batched mapInPandas stages.

The decode step executes in-container (VERDICT r6 #6): pillow when
importable, else the vendored stdlib-zlib PNG/BMP reader in
`functions/imagecodec.py`; `decode_image_stub` remains the
deterministic fake for payloads that are not real images (the synthetic
blob tables), and formats beyond the vendored codecs (JPEG, ...) raise
NotImplementedError as the residual pillow seam. The Spark-side
plumbing — schema, partition sizing, UDF signature, Arrow batch shape —
is the same regardless of backend.

Scale notes:
- binary payloads inflate row size: `repartition_for_payloads` targets a
  row-group/partition budget in BYTES, not rows, so 100 MB images don't
  produce 10 GB tasks;
- metadata (n_bytes, md5, media_type) is computed JVM-side so pruning/
  filtering on it never touches Python.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

DECODED_IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("mean_pixel", T.DoubleType()),
    ]
)


def with_blob_metadata(
    df: DataFrame, payload_col: str = "payload", text_col: str = "text"
) -> DataFrame:
    """Attach typed metadata to an opaque binary payload column —
    JVM-side expressions only, so metadata filters stay prunable."""
    return df.withColumns(
        {
            "n_bytes": F.octet_length(F.col(payload_col)),
            "content_md5": F.md5(F.col(text_col)),
            "media_type": F.lit("text/plain"),
        }
    )


def repartition_for_payloads(
    df: DataFrame,
    avg_payload_bytes: int,
    target_partition_bytes: int = 128 << 20,
    row_count: int | None = None,
    sample_fraction: float = 0.001,
) -> DataFrame:
    """Size partitions by payload BYTES: binary columns break the
    rows-per-partition heuristics every row-count-based default assumes.

    The row count comes from, in order: the caller (`row_count`, when
    ingest already knows it), Catalyst's plan statistics when the
    source propagates them (parquet footers — no data scan), else a
    plain `count()`. The count IS a full scan of the non-payload
    columns; a `sample(fraction).count()` would be the SAME scan with
    added sampling error (sample is a post-scan filter — ADVICE r4),
    so there is no cheaper honest fallback and callers at 100 TB
    should pass `row_count` or read from a stats-bearing source."""
    if sample_fraction != 0.001:  # kept for signature compat only
        import warnings

        warnings.warn(
            "repartition_for_payloads(sample_fraction=...) is ignored "
            "since r5 (sampling was the same scan with added error); "
            "pass row_count instead",
            DeprecationWarning,
            stacklevel=2,
        )
    del sample_fraction  # see docstring
    rows = row_count
    if rows is None:
        try:  # parquet sources carry row-count stats through the plan
            stats = df._jdf.queryExecution().optimizedPlan().stats()
            if stats.rowCount().isDefined():
                rows = int(str(stats.rowCount().get()))
        except Exception:
            rows = None
    if rows is None:
        rows = df.count()
    total = rows * max(avg_payload_bytes, 1)
    parts = max(1, min(rows, total // target_partition_bytes + 1))
    return df.repartition(int(parts))


def decode_image_real(payload: bytes) -> tuple[int, int, int, float]:
    """Real decode: pillow when importable, else the vendored
    stdlib-zlib PNG / 24-bit BMP reader (functions/imagecodec.py) —
    VERDICT r6 #6, the same auto-upgrading vendored-backend playbook as
    the embedding seam. NotImplementedError now means "format the
    vendored decoders don't cover and pillow is absent" (JPEG, 16-bit
    or interlaced PNG, ...), not "no decoder at all"."""
    try:
        import io

        import numpy as np
        from PIL import Image
    except ImportError:  # container default: vendored decode
        from echo_chambers_detection_spark.functions.imagecodec import (
            decode_image_bytes,
        )

        return decode_image_bytes(payload)
    img = np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))
    return img.shape[1], img.shape[0], img.shape[2], float(img.mean())


def decode_image_stub(payload: bytes) -> tuple[int, int, int, float]:
    """Deterministic fake decode: dimensions and mean pixel derived from
    payload length and a byte checksum — stable across runs, so the
    pipeline around it is fully testable."""
    n = len(payload)
    width = 16 + (n % 64)
    height = 16 + ((n // 64) % 64)
    channels = 3
    mean_pixel = (sum(payload[:256]) % 256000) / 1000.0 if n else 0.0
    return width, height, channels, mean_pixel


def decode_images(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    batch_hint: int = 256,
    decoder: str = "stub",
) -> DataFrame:
    """Arrow-batched decode stage: mapInPandas over binary payloads.

    decoder: 'stub' (deterministic, container default), 'real' (pillow,
    raises where absent), or 'auto' (real when importable, else stub).

    The iterator signature processes one Arrow batch at a time, so peak
    Python memory is one batch of payloads — the batch size is governed
    by spark.sql.execution.arrow.maxRecordsPerBatch, which callers with
    large payloads should lower (see repartition_for_payloads)."""
    if decoder not in ("stub", "real", "auto"):
        raise ValueError(f"decoder must be stub|real|auto, got {decoder!r}")

    def decode_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        mode = decoder
        if mode == "auto":
            try:
                import PIL  # noqa: F401

                mode = "real"
            except ImportError:
                # vendored PNG/BMP decode per payload; payloads whose
                # magic bytes neither vendored codec claims fall back to
                # the deterministic stub instead of raising mid-batch
                from echo_chambers_detection_spark.functions.imagecodec import (
                    sniff_format,
                )

                mode = "vendored_auto"

        def _auto(payload: bytes):
            if sniff_format(payload) is not None:
                return decode_image_real(payload)
            return decode_image_stub(payload)

        decode = {
            "real": decode_image_real,
            "stub": decode_image_stub,
            "vendored_auto": _auto,
        }[mode]
        for pdf in batches:
            out = {
                "doc_id": pdf[id_col].astype("int64"),
                "width": [],
                "height": [],
                "n_channels": [],
                "mean_pixel": [],
            }
            for payload in pdf[payload_col]:
                w, h, c, m = decode(bytes(payload))
                out["width"].append(w)
                out["height"].append(h)
                out["n_channels"].append(c)
                out["mean_pixel"].append(m)
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(
        decode_batches, schema=DECODED_IMAGE_SCHEMA
    )


def sample_frames(
    df: DataFrame,
    every_nth: int = 10,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Frame-sampling plumbing for video-like payloads: split the payload
    into fixed-size pseudo-frames and keep every nth — the explode/
    posexplode shape a real ffmpeg-backed sampler would produce."""
    frame_size = 1024
    frames = F.transform(
        F.sequence(
            F.lit(0),
            F.greatest(
                (F.octet_length(F.col(payload_col)) / frame_size).cast("int") - 1,
                F.lit(0),
            ),
        ),
        lambda i: i,
    )
    return (
        df.select(
            id_col,
            F.posexplode(frames).alias("frame_idx", "_i"),
            F.octet_length(F.col(payload_col)).alias("n_bytes"),
        )
        .where(F.col("frame_idx") % every_nth == 0)
        .drop("_i")
    )


DECODED_AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
    ]
)


def decode_audio_stub(payload: bytes) -> tuple[int, int, int, float, float]:
    """Deterministic fake audio decode for non-audio payloads — same
    role as decode_image_stub: channels/rate/length derived from the
    byte length and a checksum so the pipeline stays testable."""
    n = len(payload)
    rate = 8_000 + (n % 3) * 4_000
    n_samples = max(0, n // 2)
    rms = ((sum(payload[:256]) % 1000) / 1000.0) if n else 0.0
    return 1, rate, n_samples, n_samples / rate, rms


def decode_audio(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    decoder: str = "auto",
) -> DataFrame:
    """Arrow-batched audio feature-extract stage, the audio twin of
    `decode_images` (SURVEY.md M6): mapInPandas over binary payloads →
    (doc_id, n_channels, sample_rate, n_samples, duration_s, rms).

    decoder: 'real' (vendored stdlib RIFF/WAVE parser,
    functions/audiocodec.py — raises on non-WAV), 'stub', or 'auto'
    (real for payloads whose magic bytes say WAV, stub otherwise —
    the per-payload routing of decode_images)."""
    if decoder not in ("stub", "real", "auto"):
        raise ValueError(f"decoder must be stub|real|auto, got {decoder!r}")

    def decode_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        from echo_chambers_detection_spark.functions.audiocodec import (
            decode_wav,
            sniff_wav,
        )

        def auto(payload: bytes):
            if sniff_wav(payload):
                return decode_wav(payload)
            return decode_audio_stub(payload)

        decode = {
            "real": decode_wav,
            "stub": decode_audio_stub,
            "auto": auto,
        }[decoder]
        for pdf in batches:
            out = {
                "doc_id": pdf[id_col].astype("int64"),
                "n_channels": [],
                "sample_rate": [],
                "n_samples": [],
                "duration_s": [],
                "rms": [],
            }
            for payload in pdf[payload_col]:
                c, r, ns, dur, rms = decode(bytes(payload))
                out["n_channels"].append(c)
                out["sample_rate"].append(r)
                out["n_samples"].append(ns)
                out["duration_s"].append(dur)
                out["rms"].append(rms)
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(
        decode_batches, schema=DECODED_AUDIO_SCHEMA
    )


DECODED_VIDEO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("fps", T.DoubleType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("n_sampled", T.LongType()),
        T.StructField("mean_luma", T.DoubleType()),
    ]
)


def decode_video_stub(
    payload: bytes, frame_stride: int = 1
) -> tuple[int, int, float, int, int, float]:
    """Deterministic fake video decode for non-video payloads — the
    video twin of decode_image_stub/decode_audio_stub: geometry, frame
    count and luma derived from byte length + checksum so the pipeline
    stays testable on synthetic blob tables."""
    n = len(payload)
    width = 16 * (1 + n % 4)
    height = 16 * (1 + (n // 4) % 4)
    n_frames = max(1, n // 256)
    n_sampled = (n_frames + frame_stride - 1) // frame_stride
    luma = (sum(payload[:256]) % 256000) / 1000.0 if n else 0.0
    return width, height, 25.0, n_frames, n_sampled, luma


def decode_video(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    decoder: str = "auto",
    frame_stride: int = 1,
) -> DataFrame:
    """Arrow-batched video feature-extract + frame-sample stage, the
    video leg of the multimodal family (SURVEY.md M6): mapInPandas over
    binary payloads → (doc_id, width, height, fps, n_frames, n_sampled,
    mean_luma), where mean_luma averages the raw Y plane over every
    ``frame_stride``-th frame — the decode-side frame sampler
    (`sample_frames` is the payload-agnostic plumbing variant).

    decoder: 'real' (vendored stdlib YUV4MPEG2 parser,
    functions/videocodec.py — raises on compressed containers), 'stub',
    or 'auto' (real for payloads whose magic bytes say Y4M, stub
    otherwise — the per-payload routing of decode_images/decode_audio).
    """
    if decoder not in ("stub", "real", "auto"):
        raise ValueError(f"decoder must be stub|real|auto, got {decoder!r}")

    def decode_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        from echo_chambers_detection_spark.functions.videocodec import (
            decode_y4m,
            sniff_y4m,
        )

        def auto(payload: bytes, stride: int):
            if sniff_y4m(payload):
                return decode_y4m(payload, frame_stride=stride)
            return decode_video_stub(payload, frame_stride=stride)

        decode = {
            "real": lambda p, s: decode_y4m(p, frame_stride=s),
            "stub": decode_video_stub,
            "auto": auto,
        }[decoder]
        for pdf in batches:
            out = {
                "doc_id": pdf[id_col].astype("int64"),
                "width": [],
                "height": [],
                "fps": [],
                "n_frames": [],
                "n_sampled": [],
                "mean_luma": [],
            }
            for payload in pdf[payload_col]:
                w, h, fps, nf, ns, luma = decode(bytes(payload), frame_stride)
                out["width"].append(w)
                out["height"].append(h)
                out["fps"].append(fps)
                out["n_frames"].append(nf)
                out["n_sampled"].append(ns)
                out["mean_luma"].append(luma)
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(
        decode_batches, schema=DECODED_VIDEO_SCHEMA
    )
