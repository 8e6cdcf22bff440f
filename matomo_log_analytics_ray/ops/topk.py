"""Distributed top-k without a global sort.

The reference's work queue is ``ORDER BY date DESC LIMIT 1000``
(/root/reference/libs/lib_database.py:30-35, SURVEY.md O1). A naive
``ds.sort(...).limit(k)`` is an all-to-all range shuffle of EVERY row —
wasteful when only k survive. This operator keeps the k winners per
block inside ``map_batches`` (no data movement), then merges the
(n_blocks x k)-row partial set — tiny for any realistic k — in a single
final task. Wall-clock is one streaming pass; the only "shuffle" is the
partials' coalesce.

All stages are Arrow-native (``batch_format="pyarrow"`` +
pyarrow.compute sort kernels): blocks come zero-copy from the object
store and string columns never round-trip through pandas.

Determinism: ties are resolved by the given column order; pass enough
tiebreaker columns for a total order if exact row identity matters
(the driver-contract query orders by (ts, event_id)).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def _sort_keys(cols: list[str], descending: list[bool]):
    return [
        (c, "descending" if d else "ascending")
        for c, d in zip(cols, descending)
    ]


def _run_first_mask(tbl: "pa.Table", cols: list[str]) -> np.ndarray:
    """Boolean first-row-of-run markers over consecutive equal values
    of ``cols`` (table already sorted by them). Nulls mark run starts —
    the same convention as numpy's NaN != NaN in the previous pandas
    kernel."""
    n = len(tbl)
    first = np.zeros(n, dtype=bool)
    if n == 0:
        return first
    first[0] = True
    for c in cols:
        col = tbl[c].combine_chunks()
        neq = pc.fill_null(
            pc.not_equal(col.slice(1), col.slice(0, n - 1)), True
        )
        first[1:] |= neq.to_numpy(zero_copy_only=False)
    return first


def _head_k_per_run(
    tbl: "pa.Table", key_cols: list[str], k: int
) -> "pa.Table":
    """First k rows of every consecutive key run (table pre-sorted)."""
    n = len(tbl)
    if n == 0:
        return tbl
    first = _run_first_mask(tbl, key_cols)
    idx = np.arange(n, dtype=np.int64)
    run_start = np.maximum.accumulate(np.where(first, idx, 0))
    return tbl.filter(pa.array(idx - run_start < k))


def topk(
    ds: "ray.data.Dataset",
    sort_cols: list[str],
    k: int,
    descending: bool | list[bool] = True,
) -> "ray.data.Dataset":
    """Top-k rows of ``ds`` under (sort_cols, descending) order."""
    if isinstance(descending, bool):
        descending = [descending] * len(sort_cols)
    keys = _sort_keys(sort_cols, descending)

    def head_k(b: "pa.Table") -> "pa.Table":
        order = pc.sort_indices(b, sort_keys=keys)
        return b.take(order.slice(0, k))

    partials = ds.map_batches(head_k, batch_format="pyarrow")
    # n_blocks x k rows -> one block -> final head_k
    return partials.repartition(1).map_batches(
        head_k, batch_format="pyarrow"
    )


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
        key_cols + sort_cols,
        descending=[False] * len(key_cols) + list(descending),
    )

    def block_fn(b: "pa.Table") -> "pa.Table":
        n = len(b)
        if n == 0:
            return b.append_column("kind", pa.array([], type=pa.string()))
        first = _run_first_mask(b, key_cols)
        run_id = np.cumsum(first) - 1
        idx = np.arange(n, dtype=np.int64)
        run_start = np.maximum.accumulate(np.where(first, idx, 0))
        keep = idx - run_start < k
        edge = (run_id == 0) | (run_id == run_id[-1])
        kind = np.where(edge[keep], "edge", "done")
        return b.filter(pa.array(keep)).append_column(
            "kind", pa.array(kind, type=pa.string())
        )

    tagged = sorted_ds.map_batches(
        block_fn, batch_format="pyarrow"
    ).materialize()
    done = tagged.map_batches(
        lambda b: b.filter(pc.equal(b["kind"], "done")).drop_columns(
            ["kind"]
        ),
        batch_format="pyarrow",
    )

    merge_keys = _sort_keys(
        key_cols + sort_cols, [False] * len(key_cols) + list(descending)
    )

    def merge_edges(b: "pa.Table") -> "pa.Table":
        b = b.drop_columns(["kind"])
        if len(b) == 0:
            return b
        b = b.take(pc.sort_indices(b, sort_keys=merge_keys))
        return _head_k_per_run(b, key_cols, k)

    edges = (
        tagged.map_batches(
            lambda b: b.filter(pc.equal(b["kind"], "edge")),
            batch_format="pyarrow",
        )
        .repartition(1)
        .map_batches(merge_edges, batch_format="pyarrow")
    )
    return done.union(edges)
