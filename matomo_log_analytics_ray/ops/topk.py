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

import numpy as np
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


def grouped_topk(
    ds: "ray.data.Dataset",
    key_cols: list[str],
    sort_cols: list[str],
    k: int,
    descending: bool | list[bool] = True,
) -> "ray.data.Dataset":
    """Top-k rows PER KEY under (sort_cols, descending) — the
    ``ROW_NUMBER() OVER (PARTITION BY key ORDER BY ...) <= k`` shape
    Ray Data has no operator for. One range sort by (key, sort) then
    vectorized position-in-run masking per block; edge runs (a key
    straddling a block boundary) are PRE-REDUCED to their first k rows
    per block — the winners of a block-portion are its sort-order head,
    so the merge task sees O(blocks * k) rows, not O(rows), even for a
    single hot key spanning the whole input. Pass enough tiebreaker
    sort_cols for a total order (determinism)."""
    if isinstance(descending, bool):
        descending = [descending] * len(sort_cols)
    sorted_ds = ds.sort(
        key_cols + sort_cols, descending=[False] * len(key_cols) + list(descending)
    )

    def block_fn(b: pd.DataFrame) -> pd.DataFrame:
        n = len(b)
        if n == 0:
            out = b.copy()
            out["kind"] = pd.Series([], dtype=object)
            return out
        change = np.zeros(n, dtype=bool)
        change[0] = True
        for c in key_cols:
            v = b[c].to_numpy()
            change[1:] |= v[1:] != v[:-1]
        run_id = np.cumsum(change) - 1
        starts = np.flatnonzero(change)
        pos = np.arange(n) - starts[run_id]
        keep = pos < k
        last = run_id[-1]
        edge = (run_id == 0) | (run_id == last)
        out = b[keep].copy()
        out["kind"] = np.where(edge[keep], "edge", "done")
        return out

    tagged = sorted_ds.map_batches(block_fn, batch_format="pandas").materialize()
    done = tagged.map_batches(
        lambda b: b[b["kind"] == "done"].drop(columns=["kind"]),
        batch_format="pandas",
    )

    ascending = [True] * len(key_cols) + [not d for d in descending]

    def merge_edges(b: pd.DataFrame) -> pd.DataFrame:
        b = b.drop(columns=["kind"])
        if len(b) == 0:
            return b
        b = b.sort_values(key_cols + sort_cols, ascending=ascending, kind="mergesort")
        return b.groupby(key_cols, sort=False).head(k)

    edges = (
        tagged.map_batches(
            lambda b: b[b["kind"] == "edge"], batch_format="pandas"
        )
        .repartition(1)
        .map_batches(merge_edges, batch_format="pandas")
    )
    return done.union(edges)
