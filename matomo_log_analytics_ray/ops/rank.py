"""Grouped ranking: the full ROW_NUMBER() OVER (PARTITION BY key
ORDER BY ...) window function, distributed.

ops/topk.grouped_topk keeps only the top k per key; this operator
numbers EVERY row. Shape: one range sort by (key, sort), then two
block passes over the SAME materialized sorted dataset (batch_size=
None so both passes see identical block boundaries):

* pass A emits, for only the FIRST and LAST key-run of each block,
  a partial (key, run-first sort tuple, run length) — O(2 x blocks)
  rows. A key fully interior to one block needs no offset at all, so
  the driver fold never sees O(keys) state even at 10^8 keys.
* the driver orders each key's partials by their first sort tuple
  (globally valid because the dataset is range-sorted and the sort
  columns must form a total order per key — pass enough tiebreakers,
  same contract as grouped_topk) and prefix-sums the run lengths into
  an offset per (key, first-tuple), broadcast via ray.put.
* pass B recomputes the runs per block, assigns vectorized local
  positions, and adds the broadcast offset for its boundary runs
  (interior runs start at 0 by construction).

Ranks are 1-based, matching SQL ROW_NUMBER.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data


def _run_bounds(b: pd.DataFrame, key_cols: list[str]) -> tuple[np.ndarray, np.ndarray]:
    n = len(b)
    change = np.zeros(n, dtype=bool)
    change[0] = True
    for c in key_cols:
        v = b[c].to_numpy()
        change[1:] |= v[1:] != v[:-1]
    starts = np.flatnonzero(change)
    ends = np.append(starts[1:], n)
    return starts, ends


def _row_key(b: pd.DataFrame, i: int, cols: list[str]) -> tuple:
    return tuple(b[c].iloc[i] for c in cols)


def _grouped_prefix(
    ds: "ray.data.Dataset",
    key_cols: list[str],
    sort_cols: list[str],
    out_col: str,
    descending: bool | list[bool],
    val_col: str | None,
) -> "ray.data.Dataset":
    """Shared two-pass prefix machinery: val_col=None counts rows
    (ROW_NUMBER), otherwise running-sums val_col (SUM ... UNBOUNDED
    PRECEDING). Boundary-run measures fold on the driver into offsets
    per (key, run-first sort tuple); interior runs need none."""
    if isinstance(descending, bool):
        descending = [descending] * len(sort_cols)
    sorted_ds = ds.sort(
        key_cols + sort_cols, descending=[False] * len(key_cols) + list(descending)
    ).materialize()

    def measure(b: pd.DataFrame, s: int, e: int) -> float:
        if val_col is None:
            return e - s
        return float(b[val_col].iloc[s:e].sum())

    def partials(b: pd.DataFrame) -> pd.DataFrame:
        cols = {
            **{c: pd.Series([], dtype=b[c].dtype) for c in key_cols + sort_cols},
            "_m": pd.Series([], dtype="float64"),
        }
        if len(b) == 0:
            return pd.DataFrame(cols)
        starts, ends = _run_bounds(b, key_cols)
        runs = [0] if len(starts) == 1 else [0, len(starts) - 1]
        out = b.iloc[[starts[r] for r in runs]][key_cols + sort_cols].copy()
        out["_m"] = np.asarray(
            [measure(b, starts[r], ends[r]) for r in runs], dtype="float64"
        )
        return out

    parts = sorted_ds.map_batches(
        partials, batch_format="pandas", batch_size=None
    ).to_pandas()

    offsets: dict[tuple, float] = {}
    if len(parts):
        parts = parts.sort_values(
            key_cols + sort_cols,
            ascending=[True] * len(key_cols) + [not d for d in descending],
            kind="mergesort",
        )
        cum = 0.0
        prev_key = None
        for row in parts.itertuples(index=False):
            vals = tuple(row)
            k, ft, m = (
                vals[: len(key_cols)],
                vals[len(key_cols) : len(key_cols) + len(sort_cols)],
                vals[-1],
            )
            if k != prev_key:
                cum = 0.0
                prev_key = k
            offsets[(k, ft)] = cum
            cum += float(m)
    ref = ray.put(offsets)
    as_int = val_col is None

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        out = b.copy()
        if len(b) == 0:
            out[out_col] = pd.Series([], dtype="int64" if as_int else "float64")
            return out
        off_map = ray.get(ref)
        starts, ends = _run_bounds(b, key_cols)
        if val_col is None:
            idx = np.arange(len(b), dtype=np.int64)
            acc = (idx - np.repeat(starts, ends - starts) + 1).astype(np.float64)
        else:
            v = b[val_col].to_numpy(dtype=np.float64)
            cs = np.cumsum(v)
            base = np.repeat(np.concatenate([[0.0], cs])[starts], ends - starts)
            acc = cs - base
        bounds = [0] if len(starts) == 1 else [0, len(starts) - 1]
        for r in bounds:
            s = starts[r]
            key = (_row_key(b, s, key_cols), _row_key(b, s, sort_cols))
            off = off_map.get(key, 0.0)
            if off:
                acc[s : ends[r]] += off
        out[out_col] = acc.astype(np.int64) if as_int else acc
        return out

    return sorted_ds.map_batches(assign, batch_format="pandas", batch_size=None)


def grouped_rank(
    ds: "ray.data.Dataset",
    key_cols: list[str],
    sort_cols: list[str],
    rank_col: str = "rnk",
    descending: bool | list[bool] = False,
) -> "ray.data.Dataset":
    """Adds ``rank_col`` = 1-based position of each row within its key
    under (sort_cols, descending) — SQL ROW_NUMBER. sort_cols must
    totally order rows within a key (determinism contract, as
    grouped_topk)."""
    return _grouped_prefix(ds, key_cols, sort_cols, rank_col, descending, None)


def grouped_cumsum(
    ds: "ray.data.Dataset",
    key_cols: list[str],
    sort_cols: list[str],
    val_col: str,
    out_col: str = "running_sum",
    descending: bool | list[bool] = False,
) -> "ray.data.Dataset":
    """Adds ``out_col`` = running sum of val_col within the key under
    (sort_cols, descending) — SQL SUM(val) OVER (PARTITION BY key
    ORDER BY ... ROWS UNBOUNDED PRECEDING). Accumulates in float64;
    per-block local cumsums plus one driver-folded boundary offset per
    block keep partial-sum reordering deterministic for a fixed block
    layout."""
    return _grouped_prefix(ds, key_cols, sort_cols, out_col, descending, val_col)
