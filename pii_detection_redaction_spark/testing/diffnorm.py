"""The ONE differential-compare normalization (shared by the pytest gate
``tests/test_entry_oracle.py`` and the ``jobs/run_query.py --check``
operator tool — two spellings of the compare would disagree exactly where
it matters: tied ORDER BY keys and NULL ordering, which Spark (NULLS
FIRST) and DuckDB (NULLS LAST) sort differently, so raw-order comparison
flags phantom drifts the real gate accepts).

Column order is name-sorted, dtypes coerced to engine-neutral widths,
rows sorted by all columns — value equality is then exact."""

from __future__ import annotations

import pandas as pd


def normalize_for_diff(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("int64")
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].astype("float64")
        elif str(df[c].dtype) == "bool":
            df[c] = df[c].astype(bool)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


__all__ = ["normalize_for_diff"]
