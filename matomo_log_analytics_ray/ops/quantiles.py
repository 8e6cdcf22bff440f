"""Exact distributed grouped quantiles via histogram refinement.

Beyond-reference operator (the reference aggregates counts only,
/root/reference/libs/lib_status.py — no order statistics). Computes the
EXACT ``quantile_disc`` element (0-based rank ``ceil(n*q) - 1``, the
ANSI percentile_disc convention DuckDB implements) per group, for
bounded-cardinality group columns, without ever sorting or collecting
the data:

1. stats pass    — per-block (group, count, min, max) partials, tiny
                   driver merge; defines each target's rank + interval.
2. histogram     — per-block counts over ``n_bins`` equal-width bins of
   passes (<=2)    the target interval; the driver picks the bin that
                   contains the rank and rebases the rank into it. Two
                   levels shrink the candidate set by n_bins^2 (4M x
                   with the default 2048), so a 10^12-row group leaves
                   ~10^5 candidate rows.
3. uniques pass  — per-block (value, count) for rows still in the
                   candidate interval; point-mass duplicates collapse
                   per block, so heavy ties cost one row each. The
                   driver sorts the merged uniques (small) and indexes
                   the rebased rank.

Every pass is a streaming ``map_batches`` over the same lazy Dataset
(re-executed from source — nothing is materialized) returning a few
rows per block; all driver-side state is O(groups x qs x n_bins).
Bin membership is decided by the same deterministic float expression
in every pass, so boundary rounding can never lose a row between
levels.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

import ray.data

N_BINS = 2048


def _bin_idx(v: np.ndarray, lo: float, hi: float, n_bins: int) -> np.ndarray:
    """Deterministic bin index for v in [lo, hi]; hi (and any float
    drift) clips into the last bin."""
    if hi <= lo:
        return np.zeros(len(v), dtype=np.int64)
    idx = np.floor((v - lo) * (n_bins / (hi - lo))).astype(np.int64)
    return np.clip(idx, 0, n_bins - 1)


def _apply_chain(v: np.ndarray, target: dict, n_bins: int) -> np.ndarray:
    """Boolean mask: rows of this group's value vector that survive the
    target's refinement chain [(lo, hi, chosen_bin), ...]."""
    mask = (v >= target["lo0"]) & (v <= target["hi0"])
    for lo, hi, b in target["chain"]:
        mask &= _bin_idx(v, lo, hi, n_bins) == b
    return mask


def _cur_interval(target: dict, n_bins: int) -> tuple[float, float]:
    if not target["chain"]:
        return target["lo0"], target["hi0"]
    lo, hi, b = target["chain"][-1]
    w = (hi - lo) / n_bins
    return lo + w * b, lo + w * (b + 1)


def grouped_quantiles(
    ds: "ray.data.Dataset",
    group_col: str,
    val_col: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9),
    n_bins: int = N_BINS,
    max_collect: int = 1_000_000,
) -> pd.DataFrame:
    """Small result frame (group_col, q, value): the exact rank
    ``ceil(n*q) - 1`` element of val_col per group. Nulls are ignored.
    Assumes bounded group cardinality (the per-group state lives on the
    driver); value data itself never leaves the workers unreduced."""

    def stats_partial(b: pd.DataFrame) -> pd.DataFrame:
        sel = b[[group_col, val_col]].dropna()
        g = sel.groupby(group_col, as_index=False)[val_col].agg(
            ["count", "min", "max"]
        )
        g.columns = [group_col, "n", "lo", "hi"]
        return g

    stats = ds.map_batches(stats_partial, batch_format="pandas").to_pandas()
    if len(stats) == 0:  # empty input: to_pandas drops the schema
        return pd.DataFrame(
            {group_col: pd.Series([], dtype=object),
             "q": pd.Series([], dtype="float64"),
             "value": pd.Series([], dtype="float64")}
        )
    stats = stats.groupby(group_col, as_index=False).agg(
        n=("n", "sum"), lo=("lo", "min"), hi=("hi", "max")
    )

    targets: list[dict] = []
    for grp, n, lo, hi in zip(
        stats[group_col].tolist(), stats["n"], stats["lo"], stats["hi"]
    ):
        for q in qs:
            targets.append(
                {
                    "group": grp,
                    "q": q,
                    "rank": max(math.ceil(n * q) - 1, 0),
                    "count": int(n),
                    "lo0": float(lo),
                    "hi0": float(hi),
                    "chain": [],
                    "value": None,
                }
            )

    def needs_histogram():
        return [
            (i, t)
            for i, t in enumerate(targets)
            if t["value"] is None and t["count"] > max_collect
        ]

    # point-interval shortcut: every row in the interval is equal
    def _settle_points():
        for t in targets:
            lo, hi = _cur_interval(t, n_bins)
            if t["value"] is None and lo == hi:
                t["value"] = lo

    _settle_points()

    for _level in range(2):
        todo = needs_histogram()
        if not todo:
            break
        todo_payload = [
            (i, t["group"], t["lo0"], t["hi0"], list(t["chain"]),
             *_cur_interval(t, n_bins))
            for i, t in todo
        ]

        def hist_partial(b: pd.DataFrame) -> pd.DataFrame:
            sel = b[[group_col, val_col]].dropna()
            frames = []
            for tid, grp, lo0, hi0, chain, clo, chi in todo_payload:
                v = sel.loc[sel[group_col] == grp, val_col].to_numpy(dtype=np.float64)
                if len(v) == 0:
                    continue
                m = (v >= lo0) & (v <= hi0)
                for lo, hi, bb in chain:
                    m &= _bin_idx(v, lo, hi, n_bins) == bb
                v = v[m]
                if len(v) == 0:
                    continue
                counts = np.bincount(
                    _bin_idx(v, clo, chi, n_bins), minlength=n_bins
                )
                nz = np.flatnonzero(counts)
                frames.append(
                    pd.DataFrame(
                        {"tid": tid, "bin": nz, "n": counts[nz].astype("int64")}
                    )
                )
            if not frames:
                return pd.DataFrame(
                    {"tid": pd.Series([], dtype="int64"),
                     "bin": pd.Series([], dtype="int64"),
                     "n": pd.Series([], dtype="int64")}
                )
            return pd.concat(frames, ignore_index=True)

        hist = (
            ds.map_batches(hist_partial, batch_format="pandas")
            .to_pandas()
            .groupby(["tid", "bin"], as_index=False)["n"]
            .sum()
        )
        for i, t in todo:
            h = hist[hist["tid"] == i].sort_values("bin")
            cum = h["n"].cumsum().to_numpy()
            pos = int(np.searchsorted(cum, t["rank"] + 1))
            chosen = int(h["bin"].to_numpy()[pos])
            before = int(cum[pos - 1]) if pos else 0
            clo, chi = _cur_interval(t, n_bins)
            t["chain"].append((clo, chi, chosen))
            t["rank"] -= before
            t["count"] = int(h["n"].to_numpy()[pos])
        _settle_points()

    todo = [(i, t) for i, t in enumerate(targets) if t["value"] is None]
    if todo:
        todo_payload = [
            (i, t["group"], t["lo0"], t["hi0"], list(t["chain"])) for i, t in todo
        ]

        def uniq_partial(b: pd.DataFrame) -> pd.DataFrame:
            sel = b[[group_col, val_col]].dropna()
            frames = []
            for tid, grp, lo0, hi0, chain in todo_payload:
                v = sel.loc[sel[group_col] == grp, val_col].to_numpy(dtype=np.float64)
                if len(v) == 0:
                    continue
                m = (v >= lo0) & (v <= hi0)
                for lo, hi, bb in chain:
                    m &= _bin_idx(v, lo, hi, n_bins) == bb
                v = v[m]
                if len(v) == 0:
                    continue
                vals, counts = np.unique(v, return_counts=True)
                frames.append(
                    pd.DataFrame({"tid": tid, "v": vals, "n": counts.astype("int64")})
                )
            if not frames:
                return pd.DataFrame(
                    {"tid": pd.Series([], dtype="int64"),
                     "v": pd.Series([], dtype="float64"),
                     "n": pd.Series([], dtype="int64")}
                )
            return pd.concat(frames, ignore_index=True)

        uniq = (
            ds.map_batches(uniq_partial, batch_format="pandas")
            .to_pandas()
            .groupby(["tid", "v"], as_index=False)["n"]
            .sum()
        )
        for i, t in todo:
            u = uniq[uniq["tid"] == i].sort_values("v")
            cum = u["n"].cumsum().to_numpy()
            pos = int(np.searchsorted(cum, t["rank"] + 1))
            t["value"] = float(u["v"].to_numpy()[pos])

    return pd.DataFrame(
        {
            group_col: [t["group"] for t in targets],
            "q": [t["q"] for t in targets],
            "value": [t["value"] for t in targets],
        }
    )
