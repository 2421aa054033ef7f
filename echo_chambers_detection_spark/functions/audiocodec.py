"""Vendored stdlib-only audio decoder: RIFF/WAVE PCM parsing, so the
audio leg of the multimodal family executes in-container like the
image leg (functions/imagecodec.py) — stdlib `struct` over the RIFF
chunk list, no external audio library.

Scope: what an audio feature-extract stage needs — channel count,
sample rate, sample count, duration, and RMS amplitude over the
decoded PCM. Supported: PCM (format 1) at 8/16/32-bit and IEEE float
(format 3) at 32-bit, any channel count. Compressed formats (MP3, AAC,
ADPCM ...) raise NotImplementedError — the residual seam for codecs
that genuinely need an audio library, mirroring the image seam.
"""

from __future__ import annotations

import struct

WAV_MAGIC = b"RIFF"


def sniff_wav(payload: bytes) -> bool:
    return payload[:4] == WAV_MAGIC and payload[8:12] == b"WAVE"


def decode_wav(
    payload: bytes,
) -> tuple[int, int, int, float, float]:
    """(n_channels, sample_rate, n_samples, duration_s, rms) for a PCM
    or float32 WAV. RMS is over all channels, normalized to [-1, 1]
    full scale (8-bit WAV is unsigned per the spec)."""
    if not sniff_wav(payload):
        raise NotImplementedError("not a RIFF/WAVE signature")
    pos, n = 12, len(payload)
    fmt = None
    data = None
    while pos + 8 <= n:
        tag = payload[pos : pos + 4]
        (length,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)  # chunks pad to even
        if tag == b"fmt ":
            fmt = body
        elif tag == b"data":
            data = body
    if fmt is None or data is None:
        raise NotImplementedError("WAV missing fmt/data chunk")
    audio_format, channels, rate = struct.unpack("<HHI", fmt[:8])
    (bits,) = struct.unpack("<H", fmt[14:16])
    if audio_format == 1 and bits in (8, 16, 32):
        kind = {8: "u8", 16: "i16", 32: "i32"}[bits]
    elif audio_format == 3 and bits == 32:
        kind = "f32"
    else:
        raise NotImplementedError(
            f"WAV format {audio_format} at {bits}-bit (PCM 8/16/32 or "
            "float32 only; compressed audio needs a codec library)"
        )
    bytes_per = bits // 8
    count = len(data) // bytes_per
    n_samples = count // channels if channels else 0
    if count == 0:
        return channels, rate, 0, 0.0, 0.0
    if kind == "u8":
        vals = struct.unpack(f"<{count}B", data[: count * bytes_per])
        acc = sum(((v - 128) / 128.0) ** 2 for v in vals)
    elif kind == "i16":
        vals = struct.unpack(f"<{count}h", data[: count * bytes_per])
        acc = sum((v / 32768.0) ** 2 for v in vals)
    elif kind == "i32":
        vals = struct.unpack(f"<{count}i", data[: count * bytes_per])
        acc = sum((v / 2147483648.0) ** 2 for v in vals)
    else:  # f32
        vals = struct.unpack(f"<{count}f", data[: count * bytes_per])
        acc = sum(float(v) ** 2 for v in vals)
    rms = (acc / count) ** 0.5
    duration = n_samples / rate if rate else 0.0
    return channels, rate, n_samples, duration, rms


def encode_wav_pcm16(
    samples: list[int], sample_rate: int = 16_000, channels: int = 1
) -> bytes:
    """Minimal PCM16 WAV writer (tests + deterministic fixtures)."""
    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate,
        sample_rate * channels * 2, channels * 2, 16,
    )
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
