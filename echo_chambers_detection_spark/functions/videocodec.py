"""Vendored stdlib-only video codec: YUV4MPEG2 (Y4M) parsing, so the
video leg of the multimodal family executes in-container like the image
(functions/imagecodec.py) and audio (functions/audiocodec.py) legs.

Y4M is the uncompressed interchange format every ffmpeg pipeline can
emit (`ffmpeg -i in.mp4 -f yuv4mpegpipe out.y4m`): an ASCII stream
header `YUV4MPEG2 W<w> H<h> F<num>:<den> ...` followed by one
`FRAME\\n` marker + raw planar YUV payload per frame. Parsing it is
pure byte arithmetic — no compression, no external library.

Scope: what a video feature-extract / frame-sample stage needs —
dimensions, frame rate, frame count, and per-frame luma statistics
over the raw Y plane. Supported colorspaces: C420 (and the C420jpeg/
C420mpeg2/C420paldv siting variants — same plane sizes), C422, C444,
and Cmono. Compressed containers (MP4/H.264, WebM/VP9, ...) raise
NotImplementedError — the residual seam for codecs that genuinely need
ffmpeg, mirroring the image/audio seams.
"""

from __future__ import annotations

Y4M_MAGIC = b"YUV4MPEG2 "
_FRAME_MAGIC = b"FRAME"

_COLORSPACES = ("420", "422", "444", "mono")


def _chroma_bytes(width: int, height: int, cs: str) -> int:
    """Chroma bytes per frame. Real Y4M planes use CEILING division for
    subsampled dimensions — C420 is 2*ceil(w/2)*ceil(h/2), C422 is
    2*ceil(w/2)*h — so odd-dimension streams decode correctly instead of
    mis-advancing the frame cursor (ADVICE r7)."""
    cw, ch = (width + 1) // 2, (height + 1) // 2
    if cs == "420":
        return 2 * cw * ch
    if cs == "422":
        return 2 * cw * height
    if cs == "444":
        return 2 * width * height
    return 0  # mono


def sniff_y4m(payload: bytes) -> bool:
    return payload[: len(Y4M_MAGIC)] == Y4M_MAGIC


def decode_y4m(
    payload: bytes, frame_stride: int = 1
) -> tuple[int, int, float, int, int, float]:
    """(width, height, fps, n_frames, n_sampled, mean_luma) for a Y4M
    stream; `mean_luma` averages the raw Y plane over every
    ``frame_stride``-th frame (frames 0, s, 2s, ... — the deterministic
    frame-sampling contract), in [0, 255].
    """
    if not sniff_y4m(payload):
        raise NotImplementedError("not a YUV4MPEG2 signature")
    if frame_stride < 1:
        raise ValueError(f"frame_stride must be >= 1, got {frame_stride}")
    nl = payload.index(b"\n")
    width = height = None
    fps = 0.0
    cs = "420"
    for token in payload[len(Y4M_MAGIC) : nl].split(b" "):
        if not token:
            continue
        tag, val = chr(token[0]), token[1:].decode("ascii", "replace")
        if tag == "W":
            width = int(val)
        elif tag == "H":
            height = int(val)
        elif tag == "F":
            num, den = val.split(":")
            fps = int(num) / int(den) if int(den) else 0.0
        elif tag == "C":
            # C420jpeg / C420mpeg2 / C420paldv share 420's plane sizes
            cs = "mono" if val.startswith("mono") else val[:3]
    if width is None or height is None:
        raise NotImplementedError("Y4M header missing W/H")
    if cs not in _COLORSPACES:
        raise NotImplementedError(f"Y4M colorspace C{cs} unsupported")
    y_size = width * height
    frame_size = y_size + _chroma_bytes(width, height, cs)

    pos = nl + 1
    n = len(payload)
    n_frames = 0
    n_sampled = 0
    luma_total = 0
    while pos < n:
        if payload[pos : pos + len(_FRAME_MAGIC)] != _FRAME_MAGIC:
            raise NotImplementedError(
                f"Y4M frame marker missing at byte {pos}"
            )
        fnl = payload.index(b"\n", pos)  # FRAME line may carry params
        body = payload[fnl + 1 : fnl + 1 + frame_size]
        if len(body) < frame_size:
            raise NotImplementedError("Y4M truncated mid-frame")
        if n_frames % frame_stride == 0:
            luma_total += sum(body[:y_size])
            n_sampled += 1
        n_frames += 1
        pos = fnl + 1 + frame_size
    mean_luma = luma_total / (n_sampled * y_size) if n_sampled else 0.0
    return width, height, fps, n_frames, n_sampled, mean_luma


def encode_y4m(
    frames: list[bytes],
    width: int,
    height: int,
    fps: tuple[int, int] = (25, 1),
    colorspace: str = "C420jpeg",
) -> bytes:
    """Assemble a Y4M stream from raw Y planes (chroma planes are
    filled neutral-gray 128) — the deterministic test-fixture encoder,
    same role as encode_wav_pcm16 on the audio side."""
    y_size = width * height
    cs = "mono" if colorspace.startswith("Cmono") else colorspace[1:4]
    chroma = b"\x80" * _chroma_bytes(width, height, cs)
    out = [
        b"YUV4MPEG2 W%d H%d F%d:%d Ip A1:1 %s\n"
        % (width, height, fps[0], fps[1], colorspace.encode())
    ]
    for y_plane in frames:
        if len(y_plane) != y_size:
            raise ValueError(
                f"Y plane is {len(y_plane)} bytes, want {y_size}"
            )
        out.append(b"FRAME\n")
        out.append(y_plane)
        out.append(chroma)
    return b"".join(out)
