"""Work-queue selection over the manifest.

Analog of get_recent_log_files (/root/reference/libs/lib_database.py:30-35):
exclude statuses in the ignore list (status anti-filter F3), newest
first by date, window of ``limit`` (default 1000). Also the completed-
date semi-join of get_date_status_completed (:38-43) used by the
clean_data lifecycle.
"""

from __future__ import annotations

import pandas as pd

import ray.data

from . import status as st


def recent_work_queue(
    manifest: "ray.data.Dataset",
    collection: str,
    # REJECTED (-99) rows are our auditable analog of files the
    # reference skips before insert (lib_database.py:72) — they are
    # never work items
    ignore_status: tuple = (st.FILE_LOADED, st.FILE_INVALID, -99),
    limit: int = 1000,
) -> "ray.data.Dataset":
    ignore = set(int(s) for s in ignore_status)

    def _filter(b: pd.DataFrame) -> pd.DataFrame:
        return b[(b["collection"] == collection) & ~b["status"].isin(ignore)]

    from ..ops import topk as _topk

    # per-block partial top-k then a tiny merge — no global sort shuffle
    # (path as tiebreaker gives a total, deterministic order)
    return _topk.topk(
        manifest.map_batches(_filter, batch_format="pandas"),
        ["date", "path"],
        limit,
        descending=True,
    )


def completed_dates(
    rollup: pd.DataFrame, collection: str, dates_list: list[str]
) -> pd.DataFrame:
    """Semi-join: rollup rows of ``collection`` at DATE_COMPLETED whose
    date is in ``dates_list`` (a small driver-side list, e.g. from a
    directory listing — broadcast membership filter, J2)."""
    wanted = set(dates_list)
    out = rollup[
        (rollup["collection"] == collection)
        & (rollup["status"] == st.DATE_COMPLETED)
        & rollup["date"].isin(wanted)
    ]
    return out.reset_index(drop=True)
