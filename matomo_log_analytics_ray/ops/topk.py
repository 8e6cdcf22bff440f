"""Distributed top-k without a global sort.

The reference's work queue is ``ORDER BY date DESC LIMIT 1000``
(/root/reference/libs/lib_database.py:30-35, SURVEY.md O1). A naive
``ds.sort(...).limit(k)`` is an all-to-all range shuffle of EVERY row —
wasteful when only k survive. This operator keeps the k winners per
block inside ``map_batches`` (no data movement), then merges the
(n_blocks x k)-row partial set — tiny for any realistic k — in a single
final task. Wall-clock is one streaming pass; the only "shuffle" is the
partials' coalesce.

Determinism: ties are resolved by the given column order; pass enough
tiebreaker columns for a total order if exact row identity matters
(the driver-contract query orders by (ts, event_id)).
"""

from __future__ import annotations

import pandas as pd

import ray.data


def topk(
    ds: "ray.data.Dataset",
    sort_cols: list[str],
    k: int,
    descending: bool | list[bool] = True,
) -> "ray.data.Dataset":
    """Top-k rows of ``ds`` under (sort_cols, descending) order."""
    if isinstance(descending, bool):
        descending = [descending] * len(sort_cols)
    ascending = [not d for d in descending]

    def head_k(b: pd.DataFrame) -> pd.DataFrame:
        return b.sort_values(sort_cols, ascending=ascending).head(k)

    partials = ds.map_batches(head_k, batch_format="pandas")
    # n_blocks x k rows -> one block -> final head_k
    return partials.repartition(1).map_batches(head_k, batch_format="pandas")
