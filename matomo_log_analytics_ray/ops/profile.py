"""Column profiling: per-column data-quality stats in one pass.

The data-quality gate a training-data pipeline runs before anything
else (the reference's analog is its presence/validity gates,
/root/reference/proc/load_logs.py F1/F2 — per-file, not per-column).
One streaming ``map_batches`` pass emits a per-block partial frame of
(column, n, n_null, min, max, sum) rows — O(columns) per block — and a
tiny driver merge folds them. No shuffle, no materialization; cost is
one scan of only the projected columns.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data


def profile_columns(
    ds: "ray.data.Dataset", columns: list[str]
) -> pd.DataFrame:
    """Small frame (column, n, n_null, min_v, max_v, sum_v) for the
    given NUMERIC columns; n counts all rows, min/max/sum ignore
    nulls (SQL aggregate semantics)."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for c in columns:
            v = pd.to_numeric(b[c], errors="coerce")
            nn = v.notna()
            rows.append(
                (
                    c,
                    len(v),
                    int((~nn).sum()),
                    float(v.min()) if nn.any() else np.nan,
                    float(v.max()) if nn.any() else np.nan,
                    float(v.sum()) if nn.any() else 0.0,
                )
            )
        return pd.DataFrame(
            rows, columns=["column", "n", "n_null", "min_v", "max_v", "sum_v"]
        )

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    out = parts.groupby("column", as_index=False).agg(
        n=("n", "sum"),
        n_null=("n_null", "sum"),
        min_v=("min_v", "min"),
        max_v=("max_v", "max"),
        sum_v=("sum_v", "sum"),
    )
    out["n"] = out["n"].astype("int64")
    out["n_null"] = out["n_null"].astype("int64")
    return out
