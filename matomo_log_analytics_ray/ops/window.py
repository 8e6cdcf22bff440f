"""Ordered per-key window functions with BOUNDED carry: LAG and
rolling (ROWS BETWEEN k-1 PRECEDING AND CURRENT ROW) aggregates.

Shape: one range sort by (key, sort), then two block passes over the
same materialized sorted dataset (batch_size=None — identical block
boundaries in both passes):

* pass A collects each block's LAST ``carry`` rows (the only rows any
  LATER block can ever need — a window of k rows ending at a block's
  first row reaches back at most k rows, and rows further back are
  provably interior to some block's tail window, see the inductive
  argument in the module history). O(carry x blocks) rows total,
  broadcast once via ray.put.
* pass B prepends, to each block's FIRST key-run only, the fragment
  rows of the same key that sort strictly before the block's first
  row (the run's true predecessors), computes the window function
  fully vectorized (shifted indices / cumsum differences — no per-row
  Python), then drops the prepended rows.

Runs that START inside a block begin a new key, so their first rows
correctly see no predecessors. sort_cols must totally order rows
within a key (the grouped_topk determinism contract).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data

from .rank import _run_bounds


def _sorted_two_pass(
    ds: "ray.data.Dataset",
    key_cols: list[str],
    sort_cols: list[str],
    carry: int,
):
    """Common machinery: returns (sorted_ds, fragments DataFrame)."""
    sorted_ds = ds.sort(key_cols + sort_cols).materialize()

    def tails(b: pd.DataFrame) -> pd.DataFrame:
        return b.iloc[max(0, len(b) - carry) :]

    frags = sorted_ds.map_batches(
        tails, batch_format="pandas", batch_size=None
    ).to_pandas()
    if len(frags):
        frags = frags.sort_values(key_cols + sort_cols, kind="mergesort").reset_index(
            drop=True
        )
    return sorted_ds, frags


def _predecessors(
    frags: pd.DataFrame, b: pd.DataFrame, key_cols: list[str],
    sort_cols: list[str], carry: int,
) -> pd.DataFrame:
    """Fragment rows with the same key as b's first row that sort
    strictly before it — the true predecessors of b's first run
    (last ``carry`` of them)."""
    if len(frags) == 0 or len(b) == 0:
        return b.iloc[:0]
    first = b.iloc[0]
    m = np.ones(len(frags), dtype=bool)
    for c in key_cols:
        m &= (frags[c] == first[c]).to_numpy()
    if not m.any():
        return b.iloc[:0]
    sel = frags[m]
    # strictly-before under the composite sort order (total order per
    # key, so lexicographic comparison over sort_cols is exact)
    before = np.zeros(len(sel), dtype=bool)
    tie = np.ones(len(sel), dtype=bool)
    for c in sort_cols:
        v = sel[c].to_numpy()
        before |= tie & (v < first[c])
        tie &= v == first[c]
    out = sel[before]
    return out.iloc[max(0, len(out) - carry) :]


def grouped_lag(
    ds: "ray.data.Dataset",
    key_cols: list[str],
    sort_cols: list[str],
    val_col: str,
    n: int = 1,
    out_col: str = "lag_val",
) -> "ray.data.Dataset":
    """SQL LAG(val, n) OVER (PARTITION BY key ORDER BY sort): the value
    n rows earlier within the key, NaN when none exists."""
    sorted_ds, frags = _sorted_two_pass(ds, key_cols, sort_cols, n)
    ref = ray.put(frags)

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        out = b.copy()
        if len(b) == 0:
            out[out_col] = pd.Series([], dtype="float64")
            return out
        pre = _predecessors(ray.get(ref), b, key_cols, sort_cols, n)
        ext = pd.concat([pre, b], ignore_index=True) if len(pre) else b
        starts, ends = _run_bounds(ext, key_cols)
        v = ext[val_col].to_numpy(dtype=np.float64)
        idx = np.arange(len(ext), dtype=np.int64)
        run_start = np.repeat(starts, ends - starts)
        src = idx - n
        ok = src >= run_start
        lag = np.full(len(ext), np.nan)
        lag[ok] = v[src[ok]]
        out[out_col] = lag[len(pre) :] if len(pre) else lag
        return out

    return sorted_ds.map_batches(assign, batch_format="pandas", batch_size=None)


def grouped_rolling_mean(
    ds: "ray.data.Dataset",
    key_cols: list[str],
    sort_cols: list[str],
    val_col: str,
    window: int = 3,
    out_col: str = "rolling_mean",
) -> "ray.data.Dataset":
    """SQL AVG(val) OVER (PARTITION BY key ORDER BY sort ROWS BETWEEN
    window-1 PRECEDING AND CURRENT ROW): vectorized via cumsum
    differences with per-run window clamping."""
    carry = window - 1
    sorted_ds, frags = _sorted_two_pass(ds, key_cols, sort_cols, max(carry, 1))
    ref = ray.put(frags)

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        out = b.copy()
        if len(b) == 0:
            out[out_col] = pd.Series([], dtype="float64")
            return out
        pre = (
            _predecessors(ray.get(ref), b, key_cols, sort_cols, carry)
            if carry
            else b.iloc[:0]
        )
        ext = pd.concat([pre, b], ignore_index=True) if len(pre) else b
        starts, ends = _run_bounds(ext, key_cols)
        v = ext[val_col].to_numpy(dtype=np.float64)
        cs = np.concatenate([[0.0], np.cumsum(v)])
        idx = np.arange(len(ext), dtype=np.int64)
        run_start = np.repeat(starts, ends - starts)
        w_start = np.maximum(run_start, idx - window + 1)
        sums = cs[idx + 1] - cs[w_start]
        cnts = (idx - w_start + 1).astype(np.float64)
        roll = np.round(sums / cnts, 6)
        out[out_col] = roll[len(pre) :] if len(pre) else roll
        return out

    return sorted_ds.map_batches(assign, batch_format="pandas", batch_size=None)


def rolling_window_distinct(
    ds: "ray.data.Dataset",
    entity_col: str,
    ts_col: str,
    window_days: int = 7,
) -> "ray.data.Dataset":
    """Trailing-window distinct entities per day (e.g. 7-day active
    users): for every day D, the number of distinct entities seen in
    [D - window_days + 1, D].

    Exact and distributed: distinct (entity, day) pairs via sorted-run
    counting, a x window_days fan-out to every window-END day each
    pair covers, a SECOND sorted-run distinct over (entity, window)
    (an entity active on several days of one window must count once),
    then a low-cardinality partial-count aggregate.  Both shuffles
    move only (int64, int64) projections.  Output (day 'YYYY-MM-DD',
    active: int64) up to the last day present in the data."""
    from ray.data.aggregate import Sum

    from .dedup import sorted_group_counts

    def to_day(b: pd.DataFrame) -> pd.DataFrame:
        day = b[ts_col].to_numpy(dtype="datetime64[us]").astype("datetime64[D]")
        return pd.DataFrame(
            {
                entity_col: b[entity_col].to_numpy(),
                "_day": day.astype("int64"),
            }
        ).drop_duplicates()

    pairs = ds.select_columns([entity_col, ts_col]).map_batches(
        to_day, batch_format="pandas"
    )
    dpairs = sorted_group_counts(pairs, [entity_col, "_day"]).drop_columns(["n"])
    dpairs = dpairs.materialize()  # reused by max() and the fan-out
    mx = dpairs.max("_day")
    if mx is None:  # empty input: no days, no windows
        import ray.data as rd

        return rd.from_pandas(
            pd.DataFrame(
                {
                    "day": pd.Series([], dtype=object),
                    "active": pd.Series([], dtype="int64"),
                }
            )
        )
    max_day = int(mx)

    def fan_out(b: pd.DataFrame) -> pd.DataFrame:
        n = len(b)
        ent = np.repeat(b[entity_col].to_numpy(), window_days)
        wd = (
            np.repeat(b["_day"].to_numpy(), window_days)
            + np.tile(np.arange(window_days, dtype=np.int64), n)
        )
        keep = wd <= max_day
        return pd.DataFrame({entity_col: ent[keep], "_wd": wd[keep]})

    wpairs = sorted_group_counts(
        dpairs.map_batches(fan_out, batch_format="pandas"),
        [entity_col, "_wd"],
    ).drop_columns(["n"])

    def partials(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("_wd", as_index=False).size()
        return g.rename(columns={"size": "active"})

    agg = (
        wpairs.map_batches(partials, batch_format="pandas")
        .groupby("_wd")
        .aggregate(Sum("active", alias_name="active"))
    )

    def finalize(b: pd.DataFrame) -> pd.DataFrame:
        day = b["_wd"].to_numpy(dtype="int64").astype("datetime64[D]")
        return pd.DataFrame(
            {
                "day": np.datetime_as_string(day, unit="D"),
                "active": b["active"].to_numpy(dtype="int64"),
            }
        )

    return agg.map_batches(finalize, batch_format="pandas")
