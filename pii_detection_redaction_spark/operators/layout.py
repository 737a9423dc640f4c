"""Redaction-plan operator: everything the reference's visual redaction
sinks COMPUTE (S8/C18 — bbox geometry, severity fill color, luminance label
color, label/conf anchors, first-wins span dedup), as JVM column expressions
over (page text, detection spans). The output is the exact table a renderer
consumes; the rendering itself (pikepdf/PIL content streams) is the declared
out-of-scope seam. Spec constants and the pure-Python oracle live in
core.layout (one spec, three engines — the DuckDB re-derivation is
plans.oracles._redaction_plan_sql).

Scale shape: the geometry/color/label math is row-local whole-stage-codegen
JVM (string prefix arithmetic — no UDF, no shuffle); the only Exchange is
the first-wins window on (url, entity_type, value) — near-unique keys, the
same shape as the reference's per-document known_spans set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..core import layout as L
from ..core.entities import SEVERITY_DIM_WITH_COLORS


def _line_col(text: Column, i: Column):
    """(line, col) of 0-based char index ``i`` — split-based, same spec as
    core.layout.char_pos (prefix newline count / chars after last newline)."""
    prefix_lines = F.split(F.substring(text, 1, i), "\n", -1)
    line = F.size(prefix_lines) - 1
    col = F.length(F.element_at(prefix_lines, -1))
    return line, col


def plan_columns(text: Column, start: Column, end: Column) -> dict:
    """The geometry column map for one span (core.layout.span_bbox /
    plan_row arithmetic, verbatim as expressions)."""
    line, col = _line_col(text, start)
    # clamp to the span's first line: chars to the line's end
    line_text = F.element_at(F.split(text, "\n", -1), line + 1)
    line_end = start - col + F.length(line_text)
    end_eff = F.least(end, line_end)
    x0 = F.lit(L.MARGIN) + col.cast("double") * L.CHAR_W
    x1 = F.lit(L.MARGIN) + (col + (end_eff - start)).cast("double") * L.CHAR_W
    y1 = F.lit(L.PAGE_H - L.MARGIN) - line.cast("double") * L.LINE_H
    y0 = y1 - L.LINE_H
    return {
        "x0": x0,
        "y0": y0,
        "x1": x1,
        "y1": y1,
        "rect_w": F.greatest(F.lit(0.0), x1 - x0),
        "rect_h": F.greatest(F.lit(0.0), y1 - y0),
        "label_x": x0 + L.LABEL_DX,
        "label_y": y1 - L.LABEL_DY,
        "conf_y": y1 - L.CONF_DY,
    }


def severity_color_dim(spark) -> DataFrame:
    """(entity_type, severity, fill_r, fill_g, fill_b) broadcastable dim —
    generated from the same SEVERITY_DIM_WITH_COLORS constant as the C17
    color map and the SQL oracle's VALUES list."""
    return spark.createDataFrame(
        SEVERITY_DIM_WITH_COLORS,
        "entity_type string, severity string, fill_r double, fill_g double,"
        " fill_b double",
    )


def redaction_plan(
    spark,
    detections: DataFrame,
    pages: DataFrame,
    id_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """Per-detection redaction plan over (detections: id/entity_type/start/
    end/score, pages: id/text). First-wins dedup per (id, entity_type,
    value) by (start, end) — the reference's known_spans insertion order.
    Unknown entity types take the 'low' severity color (reference
    _color_for_entity default)."""
    d = detections.join(pages.select(id_col, text_col), id_col)
    text = F.col(text_col)
    value = F.substring(
        text, F.col("start") + 1, F.col("end") - F.col("start")
    )
    d = d.withColumn("value", value)
    w = Window.partitionBy(id_col, "entity_type", "value").orderBy(
        "start", "end"
    )
    d = d.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") == 1
    )
    geo = plan_columns(text, F.col("start"), F.col("end"))
    low = dict(
        zip(("fill_r", "fill_g", "fill_b"),
            (F.lit(float(c)) for c in L.SEVERITY_COLORS[L.DEFAULT_PLAN_SEVERITY]))
    )
    dim = severity_color_dim(spark)
    lum = None
    out = d.join(F.broadcast(dim), "entity_type", "left")
    fills = {k: F.coalesce(F.col(k), low[k]) for k in ("fill_r", "fill_g", "fill_b")}
    lum = (
        fills["fill_r"] * L.LUMA[0]
        + fills["fill_g"] * L.LUMA[1]
        + fills["fill_b"] * L.LUMA[2]
    )
    return out.select(
        F.col(id_col),
        "entity_type",
        "value",
        "start",
        "end",
        F.col("score"),
        F.concat(
            F.lit("conf: "),
            F.round(F.col("score"), 2).cast("decimal(4,2)").cast("string"),
        ).alias("conf_text"),
        *[v.alias(k) for k, v in geo.items()],
        *[v.alias(k) for k, v in fills.items()],
        (lum < L.LUMA_WHITE_BELOW).alias("label_white"),
    )
