"""Stats report figures (reference B25 — create_stats.py:95-168).

The reference renders per-tag horizontal-bar panels of the corpus
describe() with matplotlib: mean count_per_doc / text_length /
token_length per tag (``body`` excluded, sorted ascending by
count_per_doc, shared y-axis), plus percentage-of-body columns and
their difference.  No plotting library ships in this environment —
but a figure is just markup, so the renderer here emits the same
panels as dependency-free SVG (stdlib XML escaping only).  This
closes B25 fully: the 14-column CSV data product (operators/stats.py)
AND the report figures.

Driver-side by design: the input is the ``tag_stats`` describe frame
— tags × stat-columns, a few hundred rows at any corpus scale — so
collecting it is the correct plan (same judgment as k-means
centroids)."""

from __future__ import annotations

import html
import os

from pyspark.sql import DataFrame

# reference panel set (create_stats.py:128-158): three absolute
# panels, the two percentage-of-body series, and their difference
PANEL_STATS = ["count_per_doc", "text_length_mean", "token_length_mean"]

_BAR_H = 18
_GAP = 6
_LABEL_W = 120
_PLOT_W = 420
_PAD = 28


def svg_barh(
    series: list[tuple[str, list[float]]],
    labels: list[str],
    title: str,
) -> str:
    """One horizontal-bar panel: ``labels`` on the y axis (top to
    bottom), one or two ``series`` of values (overlaid bars like the
    reference's multi-column barh), linear x scale from 0 (or the
    min, for negative diffs) to the max."""
    colors = ["#4878cf", "#ee854a"]
    all_vals = [v for _, vs in series for v in vs]
    # clamp BOTH ends to include 0 — an all-negative panel (possible
    # for the diff series) would otherwise scale x(0) past the canvas
    lo = min(0.0, min(all_vals, default=0.0))
    hi = max(0.0, max(all_vals, default=1.0))
    span = (hi - lo) or 1.0
    n = len(labels)
    height = _PAD + n * (_BAR_H + _GAP) + _PAD
    width = _LABEL_W + _PLOT_W + _PAD

    def x(v: float) -> float:
        return _LABEL_W + (v - lo) / span * _PLOT_W

    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
        f'height="{height}" font-family="sans-serif" font-size="11">',
        f'<text x="{_LABEL_W}" y="16" font-weight="bold">'
        f"{html.escape(title)}</text>",
    ]
    sub_h = _BAR_H // len(series)
    for i, label in enumerate(labels):
        y0 = _PAD + i * (_BAR_H + _GAP)
        parts.append(
            f'<text x="{_LABEL_W - 6}" y="{y0 + _BAR_H - 5}" '
            f'text-anchor="end">{html.escape(label)}</text>'
        )
        for s, (sname, vals) in enumerate(series):
            v = vals[i]
            bx, bw = (x(min(v, 0.0)), abs(x(v) - x(0.0)))
            parts.append(
                f'<rect x="{bx:.1f}" y="{y0 + s * sub_h}" '
                f'width="{bw:.1f}" height="{sub_h}" '
                f'fill="{colors[s % len(colors)]}">'
                f"<title>{html.escape(f'{label} {sname}={v:g}')}</title></rect>"
            )
            parts.append(
                f'<text x="{x(max(v, 0.0)) + 4:.1f}" '
                f'y="{y0 + s * sub_h + sub_h - 1}" fill="#555">{v:g}</text>'
            )
    parts.append("</svg>")
    return "\n".join(parts)


def stats_report_panels(described: DataFrame) -> dict[str, str]:
    """The reference's five panels as ``{name: svg}`` from the
    long-format ``tag_stats`` describe frame (tag, stat_col, mean, …):
    per-tag means of the three PANEL_STATS (body excluded, ascending
    count_per_doc order — create_stats.py:97), percentage-of-body for
    text/token length, and their difference."""
    rows = described.select("tag", "stat_col", "mean").collect()
    means: dict[str, dict[str, float]] = {}
    for r in rows:
        if r["mean"] is not None:
            means.setdefault(r["tag"], {})[r["stat_col"]] = float(r["mean"])
    body = means.get("body", {})
    tags = sorted(
        (t for t in means if t != "body"),
        key=lambda t: means[t].get("count_per_doc", 0.0),
    )
    if not tags:
        return {}

    def col(stat: str) -> list[float]:
        return [means[t].get(stat, 0.0) for t in tags]

    panels = {
        stat: svg_barh([(stat, col(stat))], tags, stat)
        for stat in PANEL_STATS
    }
    # the pct panels need a real body denominator — with no body row
    # (or a zero mean) they would mislabel RAW means as fractions, so
    # they are SKIPPED rather than rendered wrong
    tl_body = body.get("token_length_mean") or 0.0
    xl_body = body.get("text_length_mean") or 0.0
    if tl_body > 0 and xl_body > 0:
        tok_pct = [v / tl_body for v in col("token_length_mean")]
        txt_pct = [v / xl_body for v in col("text_length_mean")]
        panels["length_mean_pct_of_body"] = svg_barh(
            [("token_pct", tok_pct), ("text_pct", txt_pct)],
            tags,
            "token/text length mean as fraction of body",
        )
        panels["diff_text_token_pct"] = svg_barh(
            [("diff", [a - b for a, b in zip(tok_pct, txt_pct)])],
            tags,
            "token_pct − text_pct",
        )
    return panels


def _write_text(spark, path: str, content: str) -> None:
    """Write a small text file through the HADOOP filesystem API, so
    the report lands next to the job's other outputs on ANY scheme
    the cluster has connectors for (s3a://, hdfs://, …) — a plain
    ``open()`` would silently write to the driver's local disk when
    ``--output`` is a remote URI."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    stream = fs.create(jpath, True)  # also creates parent dirs
    try:
        stream.write(bytearray(content.encode("utf-8")))
    finally:
        stream.close()


def write_stats_report(described: DataFrame, out_dir: str) -> list[str]:
    """Write one ``.svg`` per panel plus an ``index.html`` embedding
    them — the deliverable the reference's matplotlib layer produced,
    dependency-free.  Files go through the Hadoop FS (see
    :func:`_write_text`), so remote ``--output`` URIs work."""
    panels = stats_report_panels(described)
    spark = described.sparkSession
    written = []
    for name, svg in panels.items():
        path = out_dir.rstrip("/") + f"/{name}.svg"
        _write_text(spark, path, svg)
        written.append(path)
    index = out_dir.rstrip("/") + "/index.html"
    _write_text(
        spark,
        index,
        "<!doctype html><title>corpus tag statistics</title>\n"
        + "\n".join(
            f'<img src="{os.path.basename(p)}" alt="{os.path.basename(p)}">'
            for p in written
        ),
    )
    written.append(index)
    return written
