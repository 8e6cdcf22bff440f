"""Per-(collection, date) completeness rollup.

Dataset-level analog of update_date_status
(/root/reference/libs/lib_database.py:120-151): group manifest rows by
(collection, date), count LOADED files, derive the new date status via
the piecewise completeness table, and lattice-merge it into the
existing rollup (guarded upgrade T2 — only QUEUE/PARTIAL rows change).

Scale shape: the LOADED indicator is computed row-wise in map_batches
(pre-aggregation-friendly), the shuffle is a Sum over (collection,
date) — cardinality = collections x days, tiny — and the merge with the
existing rollup is a pandas join of two small aggregates.
"""

from __future__ import annotations

import pandas as pd

import ray.data
from ray.data.aggregate import Sum

from . import status


def _add_loaded_flag(batch: pd.DataFrame) -> pd.DataFrame:
    batch = batch[["collection", "date", "status"]].copy()
    batch["is_loaded"] = (batch["status"] == status.FILE_LOADED).astype("int64")
    return batch.drop(columns=["status"])


def rollup_date_status(
    manifest: "ray.data.Dataset",
    existing: pd.DataFrame | None = None,
) -> pd.DataFrame:
    """Return the updated (collection, date, status) rollup table.

    ``existing`` is the current rollup (small — one row per collection
    per day); rows absent from it are inserted at the computed status,
    present rows are lattice-merged. Rows with empty date are dropped,
    as in the reference (/root/reference/libs/lib_database.py:144-145).
    """
    counts = (
        manifest.map_batches(_add_loaded_flag, batch_format="pandas")
        .groupby(["collection", "date"])
        .aggregate(Sum("is_loaded", alias_name="n_loaded"))
        .to_pandas()
    )
    counts = counts[counts["date"] != ""].reset_index(drop=True)
    counts["proposed"] = status.compute_date_status(
        counts["n_loaded"], counts["collection"], counts["date"]
    ).to_numpy()

    if existing is None or existing.empty:
        out = counts.rename(columns={"proposed": "status"})
        return out[["collection", "date", "status"]]

    merged = existing.merge(
        counts[["collection", "date", "proposed"]],
        on=["collection", "date"],
        how="outer",
    )
    missing_cur = merged["status"].isna()
    merged.loc[missing_cur, "status"] = merged.loc[missing_cur, "proposed"]
    both = ~missing_cur & merged["proposed"].notna()
    merged.loc[both, "status"] = status.merge_date_status(
        merged.loc[both, "status"], merged.loc[both, "proposed"]
    ).to_numpy()
    merged["status"] = merged["status"].astype("int64")
    return merged[["collection", "date", "status"]]
