"""Mergeable one-pass quantile sketch (weighted order-statistic
compaction) — the single-scan complement to ops/quantiles' EXACT
histogram refinement.

The exact path re-scans the source once per refinement level (2-3
passes); at 100 TB each pass is a full read, which is the right trade
only when the answer must be exact. This module computes
approximate quantiles in ONE streaming pass:

1. per-block summary — sort the block's values and keep ``k`` evenly
   rank-spaced order statistics, each carrying weight ``n_block / k``
   (the rows it represents). A block's summary answers any rank query
   over that block with error <= n_block / (2k).
2. hierarchical compaction — summaries are themselves (value, weight)
   rows, and compacting a GROUP of summaries is the same operation on
   the weighted cumulative-rank profile, so levels compose: after the
   per-block pass the summary Dataset is repartitioned and compacted
   again whenever it still exceeds ``driver_limit`` rows. Each level
   multiplies row count by ~k / rows_per_partition and adds <= 1/(2k)
   relative rank error (error adds across levels, Greenwald-Khanna
   style; with the default k=4096 two levels stay under ~0.05 %).
3. driver finish — the residual summary (<= ``driver_limit`` rows) is
   sorted once on the driver; quantile q = the value whose cumulative
   weight first reaches q * W. Driver state is O(driver_limit),
   independent of input size.

Scale shape: one full scan, no shuffle of raw rows — only k-row
summaries move (repartition of <= blocks x k tiny rows). A 100-TB /
1M-block input emits 4e9 summary points at k=4096; one compaction
level over ~256-block groups cuts that to ~16M, a second to ~64k,
both bounded-memory map_batches over summary rows. The reference has
no order statistics at all (counts only, lib_status.py); this is the
beyond-reference scale path for "p99 of a metric over the whole
corpus in one pass".
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data

__all__ = [
    "quantile_sketch",
    "grouped_quantile_sketch",
    "block_summary",
    "compact_summaries",
]


def block_summary(v: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """(values, weights) summary of a raw-value array: k evenly
    rank-spaced order statistics, total weight preserved (== len(v)
    after NaN drop)."""
    v = v[~np.isnan(v)]
    n = len(v)
    if n == 0:
        return np.empty(0, dtype=np.float64), np.empty(0, dtype=np.float64)
    v = np.sort(v)
    m = min(k, n)
    idx = np.round(np.linspace(0, n - 1, m)).astype(np.int64)
    vals = v[idx]
    w = np.full(m, n / m, dtype=np.float64)
    return vals, w


def compact_summaries(
    vals: np.ndarray, weights: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Compact a weighted summary to <= k points, preserving total
    weight and the cumulative-rank profile: sort by value, walk the
    cumulative weight, and emit the value at k evenly spaced
    cumulative-rank targets, each point carrying the weight of the
    rank span it replaces."""
    if len(vals) == 0 or len(vals) <= k:
        return vals, weights
    order = np.argsort(vals, kind="mergesort")
    v, w = vals[order], weights[order]
    cw = np.cumsum(w)
    total = cw[-1]
    # rank targets at the center of k equal spans of [0, total]
    targets = (np.arange(k, dtype=np.float64) + 0.5) * (total / k)
    pos = np.searchsorted(cw, targets, side="left")
    pos = np.minimum(pos, len(v) - 1)
    out_v = v[pos]
    out_w = np.full(k, total / k, dtype=np.float64)
    return out_v, out_w


def quantile_sketch(
    ds: "ray.data.Dataset",
    col: str,
    qs: tuple = (0.5, 0.9, 0.99),
    k: int = 4096,
    driver_limit: int = 1_000_000,
    max_levels: int = 4,
) -> pd.DataFrame:
    """One-pass approximate quantiles of ``ds[col]``.

    Returns a DataFrame (q, value) — value is within ~levels/(2k)
    relative rank error of the exact quantile. NaN/null rows are
    dropped (the ops/validate convention)."""

    def summarize(b: pd.DataFrame) -> pd.DataFrame:
        v, w = block_summary(
            b[col].to_numpy(dtype=np.float64, na_value=np.nan), k
        )
        return pd.DataFrame({"v": v, "w": w})

    summ = ds.select_columns([col]).map_batches(
        summarize, batch_format="pandas"
    ).materialize()

    def compact_block(b: pd.DataFrame) -> pd.DataFrame:
        v, w = compact_summaries(
            b["v"].to_numpy(dtype=np.float64),
            b["w"].to_numpy(dtype=np.float64),
            k,
        )
        return pd.DataFrame({"v": v, "w": w})

    levels = 0
    while summ.count() > driver_limit and levels < max_levels:
        # each level folds ~(rows_per_partition / k)x; partition count
        # shrinks with the data so later levels stay coarse enough to
        # make progress
        n_parts = max(1, int(summ.count() // (64 * k)))
        summ = summ.repartition(n_parts).map_batches(
            compact_block, batch_format="pandas"
        ).materialize()
        levels += 1

    local = summ.to_pandas()
    if len(local) == 0:
        return pd.DataFrame({"q": list(qs), "value": [np.nan] * len(qs)})
    order = np.argsort(local["v"].to_numpy(), kind="mergesort")
    v = local["v"].to_numpy()[order]
    w = local["w"].to_numpy()[order]
    cw = np.cumsum(w)
    total = cw[-1]
    out = []
    for q in qs:
        pos = int(np.searchsorted(cw, q * total, side="left"))
        out.append((float(q), float(v[min(pos, len(v) - 1)])))
    return pd.DataFrame(out, columns=["q", "value"])


def grouped_quantile_sketch(
    ds: "ray.data.Dataset",
    group_col: str,
    col: str,
    qs: tuple = (0.5, 0.9, 0.99),
    k: int = 1024,
    driver_limit: int = 1_000_000,
    max_levels: int = 4,
) -> pd.DataFrame:
    """Per-group one-pass approximate quantiles, for BOUNDED group
    cardinality (the ops/quantiles.grouped_quantiles contract — event
    types, sinks, sources; per-USER quantiles belong to the
    rank-and-select path). One k-point summary per (group, block)
    flows back; compaction levels apply per group. Driver state is
    O(groups x driver-share), with ``driver_limit`` splitting across
    groups lazily (compaction only triggers past it)."""

    def summarize(b: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for g, sub in b.groupby(group_col, sort=False):
            v, w = block_summary(
                sub[col].to_numpy(dtype=np.float64, na_value=np.nan), k
            )
            if len(v) == 0:
                # all-null group: keep a zero-weight NaN marker so the
                # group reaches the driver finish and yields (g, q, NaN)
                # — matching the SQL GROUP BY convention (quantile over
                # all NULLs = NULL) instead of silently dropping the
                # group. Zero weight never moves the cumulative-rank
                # profile, so mixed groups are unaffected.
                v = np.array([np.nan])
                w = np.array([0.0])
            outs.append(pd.DataFrame({group_col: g, "v": v, "w": w}))
        if not outs:
            return pd.DataFrame(
                {group_col: b[group_col].iloc[:0], "v": [], "w": []}
            )
        return pd.concat(outs, ignore_index=True)

    summ = ds.select_columns([group_col, col]).map_batches(
        summarize, batch_format="pandas"
    ).materialize()

    def compact_block(b: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for g, sub in b.groupby(group_col, sort=False):
            v, w = compact_summaries(
                sub["v"].to_numpy(dtype=np.float64),
                sub["w"].to_numpy(dtype=np.float64),
                k,
            )
            outs.append(pd.DataFrame({group_col: g, "v": v, "w": w}))
        if not outs:
            # an empty block can reach here after sort's range
            # partitioning; mirror summarize's typed-empty fallback
            return pd.DataFrame(
                {group_col: b[group_col].iloc[:0], "v": [], "w": []}
            )
        return pd.concat(outs, ignore_index=True)

    levels = 0
    while summ.count() > driver_limit and levels < max_levels:
        # co-locate a group's summaries so compaction folds across
        # blocks; the summary table is tiny relative to the input
        summ = summ.sort(group_col).map_batches(
            compact_block, batch_format="pandas"
        ).materialize()
        levels += 1

    local = summ.to_pandas()
    out = []
    for g, sub in local.groupby(group_col, sort=True):
        order = np.argsort(sub["v"].to_numpy(), kind="mergesort")
        v = sub["v"].to_numpy()[order]
        w = sub["w"].to_numpy()[order]
        cw = np.cumsum(w)
        total = cw[-1] if len(cw) else 0.0
        for q in qs:
            if total == 0.0:
                out.append((g, float(q), np.nan))
                continue
            pos = int(np.searchsorted(cw, q * total, side="left"))
            out.append((g, float(q), float(v[min(pos, len(v) - 1)])))
    return pd.DataFrame(out, columns=[group_col, "q", "value"])
