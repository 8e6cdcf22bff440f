"""Heavy hitters: Misra–Gries sketch pass + exact verify pass.

Finds every value with frequency >= phi * n EXACTLY, without ever
shuffling the data:

1. sketch pass   — per-block truncated counters (a Misra–Gries summary
                   of ceil(3/phi) counters per block: exact block
                   counts, keep the top k after subtracting the
                   (k+1)-th count). Driver merge: sum counters, apply
                   the same truncation. MG guarantee: any value with
                   global count >= phi*n survives truncation (its
                   merged counter is >= true - 2n/k > 0 for k = 3/phi),
                   so the candidate set has NO false negatives; false
                   positives are possible and removed next.
2. verify pass   — broadcast the candidate list (O(3/phi) values),
                   per-block exact counts of candidates only, tiny
                   driver sum, filter >= ceil(phi * n).

Both passes are streaming map_batches with O(1/phi) rows per block;
driver state is O(1/phi). The output is therefore byte-identical to
``GROUP BY v HAVING COUNT(*) >= phi * n`` where n counts NON-NULL
rows of the column (nulls are not a countable value on either side) —
sketch speed, exact answer. (HLL's cousin for frequency; see ops/distinct.py.)
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

import ray.data


def _truncate(counts: pd.Series, k: int) -> pd.Series:
    """Misra–Gries truncation: keep <= k counters, subtracting the
    (k+1)-th largest count from the survivors."""
    if len(counts) <= k:
        return counts
    s = counts.sort_values(ascending=False)
    cut = s.iloc[k]
    out = s.iloc[:k] - cut
    return out[out > 0]


def heavy_hitters(
    ds: "ray.data.Dataset", col: str, phi: float = 0.005
) -> pd.DataFrame:
    """All values of ``col`` with count >= ceil(phi * n_rows), with
    their EXACT counts: (col, n). phi sizes the sketch: k = 3/phi
    counters, so total undercount (block truncation <= n/k, merge
    truncation <= n/k) stays STRICTLY below phi*n and a threshold
    value can never be truncated to zero."""
    k = math.ceil(3.0 / phi)

    def sketch_partial(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {col: b[col], "n": pd.Series([], dtype="int64"),
                 "kind": pd.Series([], dtype=object)}
            )
        vc = _truncate(b[col].value_counts(), k)
        out = pd.DataFrame(
            {col: vc.index, "n": vc.to_numpy(), "kind": "c"}
        )
        # ride the block's NON-NULL row count along for the global n
        # (value_counts and the verify isin both drop nulls, so the
        # threshold base must too — else nulls inflate ceil(phi*n) and
        # wrongly exclude borderline values). Placeholder key keeps the
        # column dtype intact; kind='t' rows are excluded from the
        # counter merge.
        total_row = pd.DataFrame(
            {col: [b[col].iloc[0]], "n": [int(b[col].notna().sum())], "kind": ["t"]}
        )
        return pd.concat([out, total_row], ignore_index=True)

    parts = ds.map_batches(sketch_partial, batch_format="pandas").to_pandas()
    if len(parts) == 0:  # empty input: to_pandas drops the schema
        return pd.DataFrame(
            {col: pd.Series([], dtype=object), "n": pd.Series([], dtype="int64")}
        )
    total = int(parts.loc[parts["kind"] == "t", "n"].sum())
    merged = parts[parts["kind"] == "c"].groupby(col)["n"].sum()
    candidates = _truncate(merged, k).index.tolist()
    threshold = math.ceil(phi * total)

    if not candidates:
        return pd.DataFrame({col: pd.Series([], dtype=object),
                             "n": pd.Series([], dtype="int64")})

    cand_set = set(candidates)

    def verify_partial(b: pd.DataFrame) -> pd.DataFrame:
        sel = b[b[col].isin(cand_set)]
        vc = sel[col].value_counts()
        return pd.DataFrame({col: vc.index, "n": vc.to_numpy()})

    exact = (
        ds.map_batches(verify_partial, batch_format="pandas")
        .to_pandas()
        .groupby(col, as_index=False)["n"]
        .sum()
    )
    out = exact[exact["n"] >= threshold].reset_index(drop=True)
    out["n"] = out["n"].astype("int64")
    return out
