"""Static HTML analysis report — the engine-side face of the
reference's Streamlit page (reference project/ui/app.py:17-85: user /
post count tiles, run-the-analysis, show the metric charts).

The reference UI is a thin client: two COUNT tiles, a subprocess run of
the analysis, and the chart PNGs. Everything it DISPLAYS is engine
output, so the engine ships a report generator producing the same
content as one self-contained artifact. The interactive client shell
itself (buttons, spinner, live log streaming) is served by
serving/http_api.py's /ui route (round 12) over this module's output
directory — stats, run-analysis lifecycle, and chart serving each have
socket-level tests (tests/test_serving_ui.py).

All inputs are bounded: two scalar counts, the ≤|communities|-row
metrics table, and the chart quartet from sinks/charts.py.
"""

from __future__ import annotations

import html
import os

from pyspark.sql import DataFrame, SparkSession

from echo_chambers_detection_spark.sinks.charts import save_reference_charts


def save_html_report(
    spark: SparkSession,
    metrics: DataFrame,
    out_dir: str,
    n_users: int,
    n_posts: int,
    title: str = "Echo Chamber Analysis",
    community_col: str = "community",
) -> str:
    """Write `report.html` + the chart PNGs under `out_dir`; returns the
    report path. `metrics` is the per-community metrics table
    (community_metrics_table's schema or any frame with a community
    column plus numeric metric columns)."""
    os.makedirs(out_dir, exist_ok=True)
    charts = save_reference_charts(
        metrics, out_dir, community_col=community_col
    )
    pdf = metrics.toPandas()

    tiles = (
        f"<div class='tile'><div class='num'>{n_users:,}</div>"
        f"<div class='lbl'>Number of users</div></div>"
        f"<div class='tile'><div class='num'>{n_posts:,}</div>"
        f"<div class='lbl'>Number of posts</div></div>"
    )
    head_cells = "".join(
        f"<th>{html.escape(str(c))}</th>" for c in pdf.columns
    )
    body_rows = "".join(
        "<tr>"
        + "".join(
            f"<td>{html.escape(str(v))}</td>" for v in row
        )
        + "</tr>"
        for row in pdf.itertuples(index=False)
    )
    images = "".join(
        f"<figure><img src='{os.path.basename(p)}' alt='{os.path.basename(p)}'/>"
        f"<figcaption>{os.path.basename(p)}</figcaption></figure>"
        for p in charts
    )
    doc = f"""<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>{html.escape(title)}</title>
<style>
body {{ font-family: sans-serif; margin: 2rem; }}
.tiles {{ display: flex; gap: 1rem; }}
.tile {{ border: 1px solid #ccc; border-radius: 8px; padding: 1rem 2rem; }}
.num {{ font-size: 2rem; font-weight: bold; }}
.lbl {{ color: #666; }}
table {{ border-collapse: collapse; margin-top: 1rem; }}
td, th {{ border: 1px solid #ccc; padding: 4px 8px; }}
figure {{ margin: 1rem 0; }}
img {{ max-width: 100%; }}
</style></head><body>
<h1>{html.escape(title)}</h1>
<div class="tiles">{tiles}</div>
<h2>Per-community metrics</h2>
<table><thead><tr>{head_cells}</tr></thead><tbody>{body_rows}</tbody></table>
<h2>Charts</h2>
{images}
</body></html>
"""
    path = os.path.join(out_dir, "report.html")
    with open(path, "w", encoding="utf-8") as f:
        f.write(doc)
    return path
