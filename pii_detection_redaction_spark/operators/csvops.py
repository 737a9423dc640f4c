"""Cell-wise (CSV-redactor analog) detection and redaction.

Spark-first re-expression of the reference's structured-data pipeline
(``csv_redactor/redactor.py``, SURVEY.md §3.3): a wide table is unpivoted to
long format (row_id, col_name, cell), non-empty cells are analyzed per cell
(no chunking — cells are short; reference analyzes each cell independently,
``redactor.py:31-37``), detections become a long detections table, and
redaction reassembles the wide shape via pivot-free conditional projection.

The detection summary (``csv_redactor/formatter.py:24-37``) is a plain
hash aggregation: counts per entity type + distinct affected cells.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.pandas.functions import pandas_udf

from ..core.recognizers import analyze
from ..core.scrub import mask_spans, replace_with_labels
from ..functions.udfs import DETECTIONS_TYPE, _coerce_detections


def unpivot_cells(
    df: DataFrame,
    id_col: str,
    value_cols: Sequence[str],
    passthrough_cols: Sequence[str] = (),
) -> DataFrame:
    """Wide -> long (id, [passthrough...], col_name, cell) via stack — one
    narrow projection, no shuffle. ``passthrough_cols`` ride along unchanged
    (e.g. the source-file column the ordered CSV sink sorts on)."""
    # escape before interpolating into SQL: a legitimate header like
    # "employee's email" or one containing a backtick would otherwise break
    # the stack() parse (SQL string literals double ', quoted identifiers
    # double `). Backslashes double too — Spark string literals process
    # backslash escapes by default, so an unescaped 'price\total' would
    # emit a TAB mid-name and a trailing backslash would swallow the
    # closing quote (ParseException for the whole stack()).
    pairs = ", ".join(
        "'{lit}', cast(`{ident}` as string)".format(
            lit=c.replace("\\", "\\\\").replace("'", "''"),
            ident=c.replace("`", "``"),
        )
        for c in value_cols
    )
    expr = f"stack({len(value_cols)}, {pairs}) as (col_name, cell)"
    keep = [F.col(id_col)] + [F.col(c) for c in passthrough_cols]
    return df.select(*keep, F.expr(expr))


def detect_cells(
    long_df: DataFrame,
    entities: Optional[Sequence[str]] = None,
    min_score: float = 0.0,
    cell_col: str = "cell",
) -> DataFrame:
    """Long cells + detections array per cell. Empty/whitespace cells are
    skipped (reference redactor.py:34-35) by GATING the UDF input rather than
    filtering rows — the UDF sees '' at near-zero cost and every row survives,
    so the wide reassembly can rebuild full rows from this one frame without
    joining back to the source."""
    ent = list(entities) if entities else None

    @pandas_udf(DETECTIONS_TYPE)
    def cell_detect_udf(cells: pd.Series) -> pd.Series:
        return pd.Series(
            [
                [d.as_tuple() for d in analyze(c, entities=ent, min_score=min_score)]
                for c in cells
            ]
        )

    gated = F.when(
        F.col(cell_col).isNotNull() & (F.trim(F.col(cell_col)) != ""),
        F.col(cell_col),
    ).otherwise(F.lit(""))
    return long_df.withColumn("detections", cell_detect_udf(gated))


def cell_detections_long(
    detected: DataFrame, id_col: str, include_cell_value: bool = False
) -> DataFrame:
    """Explode to one row per detection — the reference's detection-record
    shape {row, column, entity_type, start, end, score, value}
    (redactor.py:41-50). ``include_cell_value`` appends the full cell text
    as ``cell_value`` (the JSON export shape, formatter.py:8-21); off by
    default so the catalog query schema stays unchanged."""
    extra = (
        [F.col("cell").alias("cell_value")] if include_cell_value else []
    )
    return (
        detected.select(
            id_col, "col_name", "cell", F.explode("detections").alias("d")
        )
        .select(
            id_col,
            "col_name",
            F.col("d.entity_type").alias("entity_type"),
            F.col("d.start").alias("start"),
            F.col("d.end").alias("end"),
            F.round(F.col("d.score"), 4).alias("score"),
            F.expr("substring(cell, d.start + 1, d.end - d.start)").alias("value"),
            *extra,
        )
    )


def redact_cells(
    detected: DataFrame,
    use_entity_labels: bool = False,
    redaction_char: str = "*",
    cell_col: str = "cell",
) -> DataFrame:
    """Adds ``redacted_cell``: mask (default) or label replace — reference
    operator semantics (redactor.py:104-113)."""

    @pandas_udf(T.StringType())
    def scrub_cell_udf(cells: pd.Series, dets: pd.Series) -> pd.Series:
        out = []
        for c, d in zip(cells, dets):
            if c is None:  # null cell passes through untouched
                out.append(None)
                continue
            ds = _coerce_detections(d)
            if use_entity_labels:
                out.append(replace_with_labels(c, ds))
            else:
                out.append(mask_spans(c, ds, masking_char=redaction_char))
        return pd.Series(out)

    return detected.withColumn(
        "redacted_cell", scrub_cell_udf(F.col(cell_col), F.col("detections"))
    )


def detection_summary(detections_long: DataFrame, id_col: str) -> DataFrame:
    """Counts per entity type + distinct affected cells
    (reference csv_redactor/formatter.py:24-37)."""
    return (
        detections_long.groupBy("entity_type")
        .agg(
            F.count(F.lit(1)).alias("n_detections"),
            F.countDistinct(F.col(id_col), F.col("col_name")).alias("n_cells"),
        )
        .orderBy("entity_type")
    )
