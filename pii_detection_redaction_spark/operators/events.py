"""Grouped event-sequence operators (batch ``applyInPandas`` surface).

Per-group order-dependent computation — the canonical case for
``groupBy(...).applyInPandas``: each group must be seen whole and in
timestamp order (Markov transition counting over a user's event stream).
The group's rows arrive as one pandas DataFrame per key after the groupBy
shuffle; nothing crosses group boundaries, so the stage scales by key
cardinality like any hash aggregation. Equivalent SQL (the DuckDB oracle)
uses a lag window — the pandas path is the template for group logic that
has no window-function form.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TRANSITION_SCHEMA = "user_id long, from_type string, to_type string, n long"


def _transitions_fn(pdf: pd.DataFrame) -> pd.DataFrame:
    # Spec: transitions with a NULL endpoint on EITHER side are excluded —
    # pandas groupby would drop null to_type keys silently anyway, so the
    # drop is made explicit here and mirrored in the DuckDB oracle
    # (oracles.py event_transitions WHERE ... event_type IS NOT NULL).
    pdf = pdf.sort_values(["ts", "event_id"])
    prev = pdf["event_type"].shift(1)
    pairs = pd.DataFrame(
        {
            "user_id": pdf["user_id"],
            "from_type": prev,
            "to_type": pdf["event_type"],
        }
    ).dropna(subset=["from_type", "to_type"])
    # count WITHOUT re-grouping on user_id: the UDF already runs per Spark
    # group so user_id is constant here — and a NULL user_id arrives as
    # NaN, which pandas groupby (dropna=True default) would silently drop
    # from the group KEYS, vanishing the whole NULL-user group's
    # transitions while the DuckDB oracle (PARTITION BY user_id keeps the
    # NULL partition) counts them.
    out = (
        pairs.groupby(["from_type", "to_type"], as_index=False)
        .size()
        .rename(columns={"size": "n"})
    )
    uid = pdf["user_id"].iloc[0] if len(pdf) else None
    if pd.isna(uid):
        uid = None  # NaN would fail the Arrow long conversion; null is null
    out.insert(0, "user_id", pd.Series([uid] * len(out), dtype="object"))
    return out


def event_transitions(events: DataFrame) -> DataFrame:
    """Per-user consecutive event-type transition counts (ts order,
    event_id tiebreak)."""
    return (
        events.select("user_id", "ts", "event_id", "event_type")
        .groupBy("user_id")
        .applyInPandas(_transitions_fn, TRANSITION_SCHEMA)
    )


def transition_matrix(events: DataFrame) -> DataFrame:
    """Global transition matrix: sum the per-user counts."""
    return (
        event_transitions(events)
        .groupBy("from_type", "to_type")
        .agg(F.sum("n").alias("n"))
    )
