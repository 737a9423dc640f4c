"""Redaction-plan operator: everything the reference's visual redaction
sinks COMPUTE (S8/C18 — bbox geometry, severity fill color, luminance label
color, label/conf anchors, first-wins span dedup), as JVM column expressions
over (page text, detection spans). The output is the exact table a renderer
consumes; the rendering itself (pikepdf/PIL content streams) is the declared
out-of-scope seam. Spec constants and the pure-Python oracle live in
core.layout (one spec, three engines — the DuckDB re-derivation is
plans.oracles._redaction_plan_sql).

Scale shape: span post-processing, geometry, color, and label math are all
row-local whole-stage-codegen JVM (charset trims + string prefix arithmetic
— no UDF). Page text is consumed BEFORE any Exchange and dropped, so only
the narrow plan columns shuffle; when detections already carry the page
text (the explode-from-pages path) there is no join at all and the single
Exchange is the first-wins window on (id, entity_type, value) — near-unique
keys, the same shape as the reference's per-document known_spans set. When
a separate pages table is supplied, its id-hash join partitioning also
satisfies the window's clustering, so the window adds no further Exchange.
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


def postprocess_spans(
    d: DataFrame, text_col: str = "text"
) -> DataFrame:
    """reference ``pdf_redactor/analyzer.py:186-195`` as JVM charset trims
    (spec: core.layout.postprocess_span): PERSON/ORGANIZATION spans whose
    nearest preceding non-whitespace char is ':' skip their own leading
    whitespace; every span drops trailing '.,;:'; emptied spans are
    discarded. Adjusts the ``start``/``end`` columns in place."""
    text = F.col(text_col)
    s0, e0 = F.col("start"), F.col("end")
    span0 = F.substring(text, s0 + 1, e0 - s0)
    prefix_stripped = F.rtrim(F.substring(text, F.lit(1), s0), F.lit(L.WS_CHARS))
    colon_applies = F.col("entity_type").isin(list(L.TRIM_COLON_TYPES)) & (
        prefix_stripped.endswith(":")
    )
    lead_ws = F.length(span0) - F.length(F.ltrim(span0, F.lit(L.WS_CHARS)))
    s1 = F.when(colon_applies, s0 + lead_ws).otherwise(s0)
    d = d.withColumn("start", s1)
    span1 = F.substring(text, F.col("start") + 1, e0 - F.col("start"))
    e1 = F.col("start") + F.length(F.rtrim(span1, F.lit(L.TRAIL_PUNCT_CHARS)))
    return d.withColumn("end", e1).filter(F.col("end") > F.col("start"))


def redaction_plan(
    spark,
    detections: DataFrame,
    pages: DataFrame = None,
    id_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """Per-detection redaction plan over (detections: id/entity_type/start/
    end/score [+ text], pages: id/text or None when detections already
    carry text_col). Spans are post-processed first (colon-prefix trim,
    trailing punctuation — reference analyzer.py:186-195), THEN first-wins
    deduped per (id, entity_type, value) by (start, end) — the reference's
    known_spans insertion order over trimmed spans. Unknown entity types
    take the 'low' severity color (reference _color_for_entity default).
    Page text is consumed row-locally and dropped before the window, so
    only the narrow plan columns cross the Exchange."""
    if pages is not None:
        d = detections.join(pages.select(id_col, text_col), id_col)
    else:
        d = detections
    d = postprocess_spans(d, text_col=text_col)
    text = F.col(text_col)
    value = F.substring(
        text, F.col("start") + 1, F.col("end") - F.col("start")
    )
    geo = plan_columns(text, F.col("start"), F.col("end"))
    d = d.select(
        F.col(id_col),
        "entity_type",
        value.alias("value"),
        "start",
        "end",
        "score",
        *[v.alias(k) for k, v in geo.items()],
    )
    # score is a deterministic tiebreak: two sources can emit the same
    # (id, type, value, start, end) with different scores; the reference's
    # scan order is undefined for that degenerate case, so pin min-score
    w = Window.partitionBy(id_col, "entity_type", "value").orderBy(
        "start", "end", "score"
    )
    d = d.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") == 1
    )
    low = dict(
        zip(("fill_r", "fill_g", "fill_b"),
            (F.lit(float(c)) for c in L.SEVERITY_COLORS[L.DEFAULT_PLAN_SEVERITY]))
    )
    dim = severity_color_dim(spark)
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
        "x0",
        "y0",
        "x1",
        "y1",
        "rect_w",
        "rect_h",
        "label_x",
        "label_y",
        "conf_y",
        *[v.alias(k) for k, v in fills.items()],
        (lum < L.LUMA_WHITE_BELOW).alias("label_white"),
    )
