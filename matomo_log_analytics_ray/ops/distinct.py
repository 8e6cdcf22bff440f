"""Distinct counting: exact (shuffle-light) and HyperLogLog (sketch).

COUNT(DISTINCT v) GROUP BY g — the one aggregate Ray Data's built-in
``aggregate`` cannot pre-combine (distinctness is not decomposable).
Two scale shapes:

* exact    per-batch local dedup of (g, v) pairs (the only projection
           that ever shuffles), one range sort, then per-block run
           counting with the repo's interior/edge discipline
           (ops/dedup.sorted_group_counts) — distinct pairs collapse to
           (g, v) runs, and the bounded-cardinality per-group count is
           a partial-combine map_batches + tiny driver merge. Cost:
           one shuffle of the DEDUPED pair projection.
* hll      HyperLogLog(p): per-block register partials per group,
           merged by elementwise max on the driver — one streaming
           pass, NO shuffle, O(groups x 2^p) driver state, ~1.04/sqrt
           (2^p) relative error. Registers are deterministic (splitmix
           hash), so results are partition- and cluster-shape-
           invariant — same estimate every run.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data

from . import dedup, hashing

HLL_P = 12  # 4096 registers, ~1.6% relative error


def distinct_counts(
    ds: "ray.data.Dataset", group_col: str, val_col: str
) -> pd.DataFrame:
    """Exact COUNT(DISTINCT val_col) per group_col (bounded-cardinality
    groups). Returns a small pandas frame (group_col, n_distinct)."""

    import pyarrow as pa
    import pyarrow.compute as pc

    def local_pairs(b: "pa.Table") -> "pa.Table":
        # null filter: COUNT(DISTINCT v) ignores nulls (SQL semantics;
        # keeps parity with the oracle and with hll_distinct_counts).
        # Dedup via pyarrow's C++ hash group_by — no pandas round trip.
        t = b.select([group_col, val_col])
        t = t.filter(
            pc.and_(pc.is_valid(t[group_col]), pc.is_valid(t[val_col]))
        )
        return t.group_by([group_col, val_col]).aggregate([])

    pairs = ds.map_batches(local_pairs, batch_format="pyarrow")
    distinct_pairs = dedup.sorted_group_counts(
        pairs, [group_col, val_col], alias="_n"
    )

    def per_group_partial(b: "pa.Table") -> "pa.Table":
        g = b.group_by(group_col).aggregate([([], "count_all")])
        names = [
            "n_distinct" if c == "count_all" else c for c in g.column_names
        ]
        return g.rename_columns(names).select([group_col, "n_distinct"])

    out = distinct_pairs.map_batches(
        per_group_partial, batch_format="pyarrow"
    ).to_pandas()
    if len(out) == 0:  # empty input: to_pandas drops the schema
        return pd.DataFrame(
            {group_col: pd.Series([], dtype=object),
             "n_distinct": pd.Series([], dtype="int64")}
        )
    out = out.groupby(group_col, as_index=False)["n_distinct"].sum()
    out["n_distinct"] = out["n_distinct"].astype("int64")
    return out


def _hll_registers(vals: np.ndarray, p: int) -> np.ndarray:
    """Max rank-of-leading-zeros per register for one value vector."""
    m = 1 << p
    h = hashing.mix(vals.astype(np.uint64))
    reg = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = h << np.uint64(p)  # remaining 64-p bits, left-aligned
    # rank = leading zeros of `rest` + 1, capped at 64-p+1; bit_length
    # via log2 on the uint64 viewed as float is unsafe — use a loop
    # over the 64 bit positions? No: use np.frexp on float64 conversion
    # is lossy >2^53. Vectorized exact: count leading zeros by testing
    # high bits in halves (binary search, 6 fixed numpy steps).
    x = rest.copy()
    n = np.zeros(len(x), dtype=np.uint64)
    for shift in (32, 16, 8, 4, 2, 1):
        mask = x < (np.uint64(1) << np.uint64(64 - shift))
        n[mask] += np.uint64(shift)
        x[mask] = x[mask] << np.uint64(shift)
    # x == 0 -> all 64-p bits zero -> rank = 64 - p + 1
    rank = np.minimum(n + np.uint64(1), np.uint64(64 - p + 1)).astype(np.uint8)
    regs = np.zeros(m, dtype=np.uint8)
    np.maximum.at(regs, reg, rank)
    return regs


def hll_distinct_counts(
    ds: "ray.data.Dataset", group_col: str, val_col: str, p: int = HLL_P
) -> pd.DataFrame:
    """Approximate COUNT(DISTINCT val_col) per group: one streaming
    pass of per-block register partials, driver max-merge, classic HLL
    estimator with linear-counting small-range correction."""
    m = 1 << p

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for g, grp in b.groupby(group_col, sort=False):
            regs = _hll_registers(grp[val_col].dropna().to_numpy(), p)
            frames.append(pd.DataFrame({group_col: [g], "regs": [regs.tobytes()]}))
        if not frames:
            return pd.DataFrame(
                {group_col: pd.Series([], dtype=b[group_col].dtype),
                 "regs": pd.Series([], dtype=object)}
            )
        return pd.concat(frames, ignore_index=True)

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    if len(parts) == 0:  # empty input: to_pandas drops the schema
        return pd.DataFrame(
            {group_col: pd.Series([], dtype=object),
             "n_distinct_est": pd.Series([], dtype="int64")}
        )
    alpha = 0.7213 / (1 + 1.079 / m)
    rows = []
    for g, grp in parts.groupby(group_col, sort=False):
        regs = np.zeros(m, dtype=np.uint8)
        for blob in grp["regs"]:
            regs = np.maximum(regs, np.frombuffer(blob, dtype=np.uint8))
        est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
        zeros = int(np.count_nonzero(regs == 0))
        if est <= 2.5 * m and zeros:
            est = m * np.log(m / zeros)  # linear counting
        rows.append((g, int(round(est))))
    return pd.DataFrame(rows, columns=[group_col, "n_distinct_est"])
