"""End-to-end CSV redaction: the reference's ``csv_redactor`` pipeline
(redact_csv_file, ``csv_redactor/redactor.py:55-128``) as Spark source→sink.

read.csv (header/delimiter options == reference skip_header/delimiter params)
→ unpivot → per-cell detect → mask/replace → reassemble wide → write.csv,
plus the JSON detections sink (``csv_redactor/cli.py:172-178`` analog) and
the stderr summary (``formatter.py:24-37``).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.csvops import (
    cell_detections_long,
    detect_cells,
    detection_summary,
    redact_cells,
    unpivot_cells,
)

ROW_ID = "__row_id"
ROW_FILE = "__row_file"


def read_csv(
    spark: SparkSession,
    path: str,
    delimiter: str = ",",
    header: bool = True,
    multiline: bool = False,
) -> DataFrame:
    """CSV source with a row-order contract usable for multi-file inputs.

    ``__row_id`` (monotonically_increasing_id) is the unique reassembly key;
    ``__row_file`` (the ``_metadata.file_path`` hidden column) records each
    row's source file. The ordered sink sorts on (file, id): a bare
    ``__row_id`` sort would replay Spark's SCAN-PARTITION order — file
    splits are bin-packed in size-descending order, so for a directory input
    the biggest file would come first regardless of its name. Sorting by
    file first pins the contract to (file path lexicographic, position
    within file); within one file, ids rise with read order in every split,
    and splits of one file keep offset order under the planner's stable
    size sort (equal-size chunks), so the composite key is total.

    ``multiline=True`` enables RFC-4180 quoted embedded newlines (which the
    reference's Python ``csv`` reader always handles): without it Spark
    splits such a cell mid-field into bogus extra rows. It is an explicit
    knob, not the default, because multiLine makes each FILE a single
    unsplittable scan partition — the right trade for UI-parity inputs,
    the wrong default for the wide-table bench/scale path whose cells are
    newline-free."""
    df = spark.read.csv(
        path, sep=delimiter, header=header, inferSchema=False,
        multiLine=multiline,
    )
    return df.withColumn(ROW_FILE, F.col("_metadata.file_path")).withColumn(
        ROW_ID, F.monotonically_increasing_id()
    )


def redact_csv(
    df: DataFrame,
    use_entity_labels: bool = False,
    redaction_char: str = "*",
    min_score: float = 0.0,
    entities: Optional[Sequence[str]] = None,
    cache: bool = False,
    include_cell_value: bool = False,
) -> Dict[str, DataFrame]:
    """Returns {'redacted': wide redacted frame, 'detections': long table,
    'summary': per-entity-type counts}. ``include_cell_value`` adds the full
    cell text to the detections table (the JSON export shape).

    ``cache=True`` persists the per-cell detection frame: the three outputs
    share its lineage, and a caller materializing all three (the CLI job)
    would otherwise run the regex bank over every cell three times."""
    value_cols = [c for c in df.columns if c not in (ROW_ID, ROW_FILE)]
    passthrough = [ROW_FILE] if ROW_FILE in df.columns else []
    long = unpivot_cells(df, ROW_ID, value_cols, passthrough_cols=passthrough)
    # detect_cells keeps every (row, col) pair alive (empty cells gated, not
    # filtered), so the long frame alone carries everything reassembly needs.
    detected = detect_cells(long, entities=entities, min_score=min_score)
    if cache:
        detected = detected.persist()
    detections = cell_detections_long(
        detected, ROW_ID, include_cell_value=include_cell_value
    )

    # Single-shuffle wide reassembly: one groupBy(row) builds a col->cell map
    # per row, columns project out of the map. Exchange count is 1 regardless
    # of column count (the former per-column join chain was N shuffles for an
    # N-column CSV — plan-shape test pins the new shape). The source-file
    # column joins the grouping key (it is constant per row id), so the
    # ordered sink can sort (file, id) without a join back to the source.
    redacted_long = redact_cells(
        detected, use_entity_labels=use_entity_labels, redaction_char=redaction_char
    ).select(ROW_ID, *passthrough, "col_name", "redacted_cell")
    wide = (
        redacted_long.groupBy(ROW_ID, *passthrough)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("col_name", "redacted_cell"))
            ).alias("__cells")
        )
        .select(
            ROW_ID,  # kept so sinks can restore input row order (write_csv)
            *passthrough,
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
        # the persisted handle (None when cache=False): callers that loop
        # over many files must unpersist it after materializing the outputs,
        # or the cached detection partitions accumulate for the whole batch
        "cached": detected if cache else None,
    }


def write_csv(
    df: DataFrame,
    path: str,
    delimiter: str = ",",
    header: bool = True,
    ordered: bool = True,
) -> None:
    """CSV sink. The internal ``__row_id`` / ``__row_file`` columns are
    dropped before writing; ``ordered=True`` (default) first sorts on
    (source file, row id) so the redacted output preserves input row order —
    per file, files in lexicographic path order — essential for header-less/
    positional CSVs where no column correlates rows otherwise (the reference
    CLI writes rows in input order, redactor.py:124-126)."""
    internal = [c for c in (ROW_FILE, ROW_ID) if c in df.columns]
    if internal:
        if ordered:
            df = df.orderBy(*internal)
        df = df.drop(*internal)
    df.write.mode("overwrite").csv(path, sep=delimiter, header=header)


def detections_to_json(
    detections: DataFrame, source: Optional[DataFrame] = None
) -> DataFrame:
    """JSON detections sink shape (reference formatter.py:8-21): one JSON
    string per detection row.

    Pass ``source`` (the ``read_csv`` frame the detections came from) to
    export the reference's 0-based input row index as ``row``: the internal
    ``__row_id`` is ``monotonically_increasing_id``, whose VALUE jumps by
    2^33 at scan-partition boundaries — only its order is the row order, so
    the raw id must never leak into an artifact. The rank needs the FULL
    source row set (undetected rows still occupy indices), hence the
    parameter. ``row`` is PER FILE (window partitioned by ``__row_file``):
    the reference CLI redacts one file at a time, so its ``row`` restarts
    at 0 per input file (csv_redactor/cli.py:172-178); for a directory
    input the export also carries ``file`` (the source path) — a per-file
    index with the file identity dropped would locate nothing. Single-file
    sources are byte-identical to the reference (no ``file`` field, same
    indices; one window partition ≡ the old global sort). Without
    ``source`` the frame is serialized as-is (caller owns the columns)."""
    if source is not None and ROW_ID in detections.columns:
        if ROW_FILE in source.columns:
            w = Window.partitionBy(ROW_FILE).orderBy(ROW_ID)
            # driver-side file listing — CSV has no column pruning, so a
            # distinct() over the metadata column would re-parse every
            # input byte just to learn the file count
            multi = len(source.inputFiles()) > 1
        else:
            w, multi = Window.orderBy(ROW_ID), False
        sel = [F.col(ROW_ID), (F.row_number().over(w) - 1).alias("row")]
        if multi:
            # _metadata.file_path is a percent-encoded file:// URI; export
            # the real filesystem path (strip scheme, url_decode) so the
            # field joins against input names / the batch manifest keys.
            # Literal '+' pre-escapes to %2B: url_decode is form-decoding,
            # which would otherwise read '+' as a space.
            decoded = F.url_decode(
                F.regexp_replace(
                    F.regexp_replace(F.col(ROW_FILE), r"^file:(//)?", ""),
                    r"\+", "%2B",
                )
            )
            sel.append(decoded.alias("file"))
        rows = source.select(*sel)
        keep = [c for c in detections.columns if c not in (ROW_ID, ROW_FILE)]
        lead = ["file", "row"] if multi else ["row"]
        detections = detections.join(rows, ROW_ID).select(*lead, *keep)
    return detections.select(
        F.to_json(F.struct(*[F.col(c) for c in detections.columns])).alias("json")
    )
