"""End-to-end CSV redaction: the reference's ``csv_redactor`` pipeline
(redact_csv_file, ``csv_redactor/redactor.py:55-128``) as Spark source→sink.

read.csv (header/delimiter options == reference skip_header/delimiter params)
→ unpivot → per-cell detect → mask/replace → reassemble wide → write.csv,
plus the JSON detections sink (``csv_redactor/cli.py:172-178`` analog) and
the stderr summary (``formatter.py:24-37``).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.csvops import (
    cell_detections_long,
    detect_cells,
    detection_summary,
    redact_cells,
    unpivot_cells,
)

ROW_ID = "__row_id"


def read_csv(
    spark: SparkSession,
    path: str,
    delimiter: str = ",",
    header: bool = True,
) -> DataFrame:
    df = spark.read.csv(path, sep=delimiter, header=header, inferSchema=False)
    # stable row ids for reassembly (monotonically increasing per partition
    # is fine: uniqueness is all reassembly needs)
    return df.withColumn(ROW_ID, F.monotonically_increasing_id())


def redact_csv(
    df: DataFrame,
    use_entity_labels: bool = False,
    redaction_char: str = "*",
    min_score: float = 0.0,
    entities: Optional[Sequence[str]] = None,
    cache: bool = False,
) -> Dict[str, DataFrame]:
    """Returns {'redacted': wide redacted frame, 'detections': long table,
    'summary': per-entity-type counts}.

    ``cache=True`` persists the per-cell detection frame: the three outputs
    share its lineage, and a caller materializing all three (the CLI job)
    would otherwise run the regex bank over every cell three times."""
    value_cols = [c for c in df.columns if c != ROW_ID]
    long = unpivot_cells(df, ROW_ID, value_cols)
    # detect_cells keeps every (row, col) pair alive (empty cells gated, not
    # filtered), so the long frame alone carries everything reassembly needs.
    detected = detect_cells(long, entities=entities, min_score=min_score)
    if cache:
        detected = detected.persist()
    detections = cell_detections_long(detected, ROW_ID)
    redacted_long = redact_cells(
        detected, use_entity_labels=use_entity_labels, redaction_char=redaction_char
    ).select(ROW_ID, "col_name", "redacted_cell")

    # Single-shuffle wide reassembly: one groupBy(row) builds a col->cell map
    # per row, columns project out of the map. Exchange count is 1 regardless
    # of column count (the former per-column join chain was N shuffles for an
    # N-column CSV — plan-shape test pins the new shape).
    wide = (
        redacted_long.groupBy(ROW_ID)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("col_name", "redacted_cell"))
            ).alias("__cells")
        )
        .select(
            ROW_ID,  # kept so sinks can restore input row order (write_csv)
            *[
                F.element_at(F.col("__cells"), F.lit(c)).alias(c)
                for c in value_cols
            ],
        )
    )

    return {
        "redacted": wide,
        "detections": detections,
        "summary": detection_summary(detections, ROW_ID),
    }


def write_csv(
    df: DataFrame,
    path: str,
    delimiter: str = ",",
    header: bool = True,
    ordered: bool = True,
) -> None:
    """CSV sink. When the frame carries the internal ``__row_id`` it is
    dropped before writing; ``ordered=True`` (default) first sorts on it so
    the redacted output preserves input row order — essential for
    header-less/positional CSVs where no column correlates rows otherwise
    (the reference CLI writes rows in input order, redactor.py:124-126)."""
    if ROW_ID in df.columns:
        df = df.orderBy(ROW_ID) if ordered else df
        df = df.drop(ROW_ID)
    df.write.mode("overwrite").csv(path, sep=delimiter, header=header)


def detections_to_json(detections: DataFrame) -> DataFrame:
    """JSON detections sink shape (reference formatter.py:8-21): one JSON
    string per detection row."""
    return detections.select(
        F.to_json(F.struct(*[F.col(c) for c in detections.columns])).alias("json")
    )
