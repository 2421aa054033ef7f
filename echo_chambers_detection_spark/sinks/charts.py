"""PNG chart sink — the reference's S20 surface
(reference project/metrics/visualization.py:7-47: four seaborn barplots
of the per-community metrics saved as PNGs).

Driver-side by design: the input is the community METRICS table —
#communities rows, bounded by construction (the same bounded-collect
contract as the IVF centroids) — so `.toPandas()` here is chart data,
not row data.

Two render paths:
- matplotlib (`Agg`) when importable — the reference-fidelity path,
  with titles/ticks/labels;
- a dependency-free numpy rasterizer + stdlib-zlib PNG encoder
  otherwise (this container has no matplotlib): real, valid PNGs of
  the same bars, no text glyphs. The fallback keeps the sink a working
  component rather than an import-guarded stub.
"""

from __future__ import annotations

import os
import struct
import zlib

from pyspark.sql import DataFrame


def _png_encode(rgb) -> bytes:
    """Encode an (H, W, 3) uint8 array as a valid PNG (8-bit RGB,
    filter 0 scanlines, one IDAT)."""
    import numpy as np

    h, w, _ = rgb.shape

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    raw = b"".join(
        b"\x00" + rgb[y].astype(np.uint8).tobytes() for y in range(h)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def _raster_bars(values, color, width=1000, height=600) -> bytes:
    """Rasterize one bar series into PNG bytes: white canvas, axis
    line, margin, bars scaled to [min(0, min), max(0, max)]."""
    import numpy as np

    img = np.full((height, width, 3), 255, dtype=np.uint8)
    m = 40  # margin px
    plot_w, plot_h = width - 2 * m, height - 2 * m
    import math

    # pandas renders SQL NULL as NaN in double columns — chart as 0-height
    vals = [
        0.0 if v is None or (isinstance(v, float) and math.isnan(v)) else float(v)
        for v in values
    ]
    if not vals:
        return _png_encode(img)
    lo, hi = min(0.0, min(vals)), max(0.0, max(vals))
    span = (hi - lo) or 1.0
    zero_y = m + int(round((hi - 0.0) / span * (plot_h - 1)))
    n = len(vals)
    slot = plot_w / n
    bar_w = max(1, int(slot * 0.8))
    for i, v in enumerate(vals):
        x0 = m + int(i * slot + (slot - bar_w) / 2)
        vy = m + int(round((hi - v) / span * (plot_h - 1)))
        y0, y1 = min(vy, zero_y), max(vy, zero_y)
        img[y0 : y1 + 1, x0 : x0 + bar_w] = color
    # axis lines
    img[zero_y, m : m + plot_w] = (60, 60, 60)
    img[m : m + plot_h, m] = (60, 60, 60)
    return _png_encode(img)


def save_bar_chart_png(
    df: DataFrame,
    x_col: str,
    y_col: str,
    path: str,
    title: str | None = None,
    ylabel: str | None = None,
    ascending: bool = False,
    color: tuple[int, int, int] = (76, 120, 168),  # reference #4c78a8
) -> str:
    """Sort by y_col, render one bar per x_col value, save PNG.
    Returns the written path."""
    pdf = (
        df.select(x_col, y_col)
        .toPandas()
        .sort_values(y_col, ascending=ascending)
    )
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.figure(figsize=(10, 6))
        plt.bar(
            pdf[x_col].astype(str),
            pdf[y_col],
            color="#%02x%02x%02x" % color,
        )
        plt.xticks(rotation=90)
        if ylabel:
            plt.ylabel(ylabel)
        if title:
            plt.title(title)
        plt.tight_layout()
        plt.savefig(path)
        plt.close()
    except ImportError:
        with open(path, "wb") as f:
            f.write(_raster_bars(pdf[y_col].tolist(), color))
    return path


# the four reference charts (visualization.py:7-47): metric column,
# sort direction, bar color, ylabel
REFERENCE_CHARTS = {
    "ecs": (False, (76, 120, 168), "ECS (cohesion x separation)"),
    "conductance": (True, (245, 133, 24), "Conductance (lower = more insulated)"),
    "homophily": (True, (84, 162, 75), "Homophily"),
    "variance": (True, (84, 162, 75), "Mean squared distance to centroid"),
}


def save_reference_charts(
    metrics: DataFrame, out_dir: str, community_col: str = "community"
) -> list[str]:
    """Mirror the reference's display_* quartet over the per-community
    metrics table: one `{metric}_by_community.png` each."""
    os.makedirs(out_dir, exist_ok=True)
    written = []
    cols = set(metrics.columns)
    for metric, (asc, color, ylabel) in REFERENCE_CHARTS.items():
        if metric not in cols:
            continue
        written.append(
            save_bar_chart_png(
                metrics,
                community_col,
                metric,
                os.path.join(out_dir, f"{metric}_by_community.png"),
                title=f"{metric} by community",
                ylabel=ylabel,
                ascending=asc,
                color=color,
            )
        )
    return written
