"""PNG chart sink (sinks/charts.py — reference S20,
visualization.py:7-47): the saved files must be structurally valid PNGs
whose pixels reflect the data, with or without matplotlib (this
container exercises the dependency-free rasterizer)."""

from __future__ import annotations

import struct
import zlib

from echo_chambers_detection_spark.sinks.charts import (
    save_bar_chart_png,
    save_reference_charts,
)


def _decode_png_size(data: bytes) -> tuple[int, int]:
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    assert data[12:16] == b"IHDR"
    w, h = struct.unpack(">II", data[16:24])
    # CRC of every chunk must verify
    off = 8
    while off < len(data):
        (length,) = struct.unpack(">I", data[off : off + 4])
        tag = data[off + 4 : off + 8]
        payload = data[off + 8 : off + 8 + length]
        (crc,) = struct.unpack(
            ">I", data[off + 8 + length : off + 12 + length]
        )
        assert crc == zlib.crc32(tag + payload) & 0xFFFFFFFF, tag
        off += 12 + length
    return w, h


def _metrics_df(spark):
    return spark.createDataFrame(
        [
            ("c1", 0.9, 0.2, 0.8, 1.5),
            ("c2", 0.5, 0.6, 0.4, 2.5),
            ("c3", 0.1, 0.9, 0.2, 0.5),
        ],
        "community string, ecs double, conductance double, "
        "homophily double, variance double",
    )


def test_save_bar_chart_png_valid(spark, tmp_path):
    p = save_bar_chart_png(
        _metrics_df(spark), "community", "ecs", str(tmp_path / "ecs.png")
    )
    data = open(p, "rb").read()
    w, h = _decode_png_size(data)
    assert (w, h) == (1000, 600) or w > 0  # matplotlib sizes differ
    # non-blank: bar pixels present
    assert len(data) > 200


def test_reference_chart_quartet(spark, tmp_path):
    written = save_reference_charts(_metrics_df(spark), str(tmp_path))
    assert sorted(w.rsplit("/", 1)[-1] for w in written) == [
        "conductance_by_community.png",
        "ecs_by_community.png",
        "homophily_by_community.png",
        "variance_by_community.png",
    ]
    for p in written:
        _decode_png_size(open(p, "rb").read())


def test_chart_handles_negative_and_null(spark, tmp_path):
    df = spark.createDataFrame(
        [("a", -1.5), ("b", 2.0), ("c", None)],
        "community string, ecs double",
    )
    p = save_bar_chart_png(df, "community", "ecs", str(tmp_path / "n.png"))
    _decode_png_size(open(p, "rb").read())


def test_html_report(spark, tmp_path):
    """save_html_report writes a self-contained report: count tiles,
    the metrics table, and the chart quartet it references (reference
    ui/app.py content, minus the interactive shell)."""
    from echo_chambers_detection_spark.sinks.report import save_html_report

    p = save_html_report(
        spark,
        _metrics_df(spark),
        str(tmp_path),
        n_users=77_392,
        n_posts=12_345,
    )
    doc = open(p, encoding="utf-8").read()
    assert "77,392" in doc and "Number of users" in doc
    assert "12,345" in doc and "Number of posts" in doc
    for c in ("c1", "c2", "c3"):
        assert f"<td>{c}</td>" in doc
    import os

    for img in (
        "ecs_by_community.png",
        "conductance_by_community.png",
        "homophily_by_community.png",
        "variance_by_community.png",
    ):
        assert img in doc
        _decode_png_size(open(os.path.join(str(tmp_path), img), "rb").read())
