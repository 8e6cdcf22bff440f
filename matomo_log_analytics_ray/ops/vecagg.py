"""Vector-column aggregates: grouped centroids over an embedding
column (list<float>).

The embedding-side grouped aggregate a training-data pipeline needs
for cluster inspection, class prototypes and drift monitoring. Shape:
each block reduces to (group, dim, partial_sum, partial_count) rows —
O(groups x dim) per block regardless of row count, so only tiny
partials leave the workers and the driver folds them (the
profile.py / quantiles.py multi-pass-partials house pattern; no
shuffle of the vectors themselves). Sums accumulate in float64 and the
gated output rounds to 6 dp (floats are gated as MEANS, per the
NOTES_ROUND2 float-gating rule).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data


def grouped_centroids(
    ds: "ray.data.Dataset",
    group_col: str = "label",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """(group, dim, mean_val) — the per-group mean of every embedding
    dimension, computed from per-block partials. Returns a small
    pandas frame (groups x dims rows)."""

    def part(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {
                    group_col: pd.Series([], dtype="int64"),
                    "dim": pd.Series([], dtype="int64"),
                    "s": pd.Series([], dtype="float64"),
                    "c": pd.Series([], dtype="int64"),
                }
            )
        mat = np.stack(b[vec_col].to_numpy()).astype(np.float64)
        groups = b[group_col].to_numpy()
        uniq, inv = np.unique(groups, return_inverse=True)
        g, d = len(uniq), mat.shape[1]
        sums = np.zeros((g, d), dtype=np.float64)
        np.add.at(sums, inv, mat)
        counts = np.bincount(inv, minlength=g)
        return pd.DataFrame(
            {
                group_col: np.repeat(uniq, d),
                "dim": np.tile(np.arange(d, dtype=np.int64), g),
                "s": sums.ravel(),
                "c": np.repeat(counts, d).astype("int64"),
            }
        )

    parts = ds.map_batches(part, batch_format="pandas").to_pandas()
    if len(parts) == 0:
        return pd.DataFrame(
            {
                group_col: pd.Series([], dtype="int64"),
                "dim": pd.Series([], dtype="int64"),
                "mean_val": pd.Series([], dtype="float64"),
            }
        )
    agg = parts.groupby([group_col, "dim"], as_index=False).agg(
        s=("s", "sum"), c=("c", "sum")
    )
    agg["mean_val"] = (agg["s"] / agg["c"]).round(6)
    return agg[[group_col, "dim", "mean_val"]].sort_values(
        [group_col, "dim"]
    ).reset_index(drop=True)
