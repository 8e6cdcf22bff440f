"""Declarative data-quality validation (the deequ / Great
Expectations shape): a rule list evaluates over the dataset in ONE
streaming pass, producing per-rule violation counts — the audit gate
a production ingestion pipeline runs before publishing a partition
(the reference's validity predicate, ``lib_status.py``'s
VALID/INVALID routing, generalized to arbitrary rules).

Rules (each a dict):

* ``{"rule": "not_null", "col": c}`` — null/NaN count
* ``{"rule": "range", "col": c, "lo": x, "hi": y}`` — values outside
  [lo, hi] (nulls don't double-count; they're not in-range failures)
* ``{"rule": "in_set", "col": c, "values": [...]}`` — values outside
  the allowed set
* ``{"rule": "unique", "col": c}`` — duplicated values (count of rows
  beyond the first occurrence per value) — needs one sorted-run pass
* ``{"rule": "fk_exists", "col": c, "ref": ds, "ref_col": r}`` —
  child keys with no parent: a BROADCAST sorted-array probe when the
  parent key set fits ``broadcast_limit``, else the distributed path:
  sorted-run counts of the child-key projection LEFT-ANTI hash-joined
  against the parent keys (only (key, n) winner rows move), so the
  rule scales to fact-sized parents.  NULL child keys count as
  violations on both paths (SQL LEFT JOIN semantics: NULL never
  matches a parent); keys are int64 by contract (documented).

Row-scale rules (not_null/range/in_set) fold per batch — only
(rule, partial_count) rows leave workers.  Output: one row per rule
(rule, col, violations, n_checked).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data

from .dedup import sorted_group_counts

_BCAST_LIMIT = 5_000_000  # parent keys; ~40 MB of int64 broadcast


def _rule_name(r: dict) -> str:
    return f"{r['rule']}({r['col']})"


def validate(
    ds: "ray.data.Dataset",
    rules: list[dict],
    broadcast_limit: int = _BCAST_LIMIT,
) -> pd.DataFrame:
    """Evaluate all rules; returns a small DataFrame
    (rule, violations, n_checked) — driver holds O(rules) rows."""
    batch_rules = [
        r for r in rules if r["rule"] in ("not_null", "range", "in_set")
    ]
    out_rows = []

    if batch_rules:
        def partials(b: pd.DataFrame) -> pd.DataFrame:
            rows = []
            for r in batch_rules:
                v = b[r["col"]]
                if r["rule"] == "not_null":
                    bad = int(v.isna().sum())
                elif r["rule"] == "range":
                    x = v.to_numpy(dtype="float64")
                    ok = ~np.isnan(x)
                    bad = int(((x < r["lo"]) | (x > r["hi"]))[ok].sum())
                else:  # in_set
                    bad = int((~v.isin(r["values"]) & v.notna()).sum())
                rows.append((_rule_name(r), bad, len(b)))
            return pd.DataFrame(rows, columns=["rule", "violations", "n"])

        parts = ds.map_batches(partials, batch_format="pandas").to_pandas()
        folded = parts.groupby("rule", as_index=False)[["violations", "n"]].sum()
        for _, row in folded.iterrows():
            out_rows.append((row["rule"], int(row["violations"]), int(row["n"])))

    for r in rules:
        if r["rule"] == "unique":
            counts = sorted_group_counts(
                ds.select_columns([r["col"]]), [r["col"]]
            )

            def dup_partials(b: pd.DataFrame) -> pd.DataFrame:
                n = b["n"].to_numpy(dtype="int64")
                return pd.DataFrame(
                    {"d": [int((n - 1).clip(min=0).sum())], "t": [int(n.sum())]}
                )

            f = counts.map_batches(
                dup_partials, batch_format="pandas"
            ).to_pandas()
            out_rows.append(
                (_rule_name(r), int(f["d"].sum()), int(f["t"].sum()))
            )
        elif r["rule"] == "fk_exists":
            col, refc = r["col"], r["ref_col"]
            ref_keys = r["ref"].select_columns([refc]).materialize()
            n_ref = ref_keys.count()
            if n_ref <= broadcast_limit:
                keys = np.sort(
                    ref_keys.to_pandas()[refc].to_numpy(dtype=np.int64)
                )
                kref = ray.put(keys)

                def fk_partials(b: pd.DataFrame) -> pd.DataFrame:
                    k = ray.get(kref)
                    s = b[col]
                    na = s.isna().to_numpy()
                    v = s[~na].to_numpy(dtype=np.int64)
                    bad = int(na.sum())  # NULL child key: violation
                    if len(k) == 0:
                        bad += len(v)
                    elif len(v):
                        pos = np.minimum(np.searchsorted(k, v), len(k) - 1)
                        bad += int((k[pos] != v).sum())
                    return pd.DataFrame({"d": [bad], "t": [len(b)]})

                f = ds.select_columns([col]).map_batches(
                    fk_partials, batch_format="pandas"
                ).to_pandas()
                out_rows.append(
                    (_rule_name(r), int(f["d"].sum()), int(f["t"].sum()))
                )
            else:
                # Distributed path: (child_key, n) winners via sorted
                # runs (nulls split off per batch as scalar partials),
                # LEFT-ANTI hash join vs parent keys — only key-sized
                # projections ever shuffle; the child table does not.
                from . import default_join_partitions

                child = ds.select_columns([col]).materialize()
                n_total = child.count()

                def null_partials(b: pd.DataFrame) -> pd.DataFrame:
                    return pd.DataFrame({"d": [int(b[col].isna().sum())]})

                n_null = int(
                    child.map_batches(null_partials, batch_format="pandas")
                    .to_pandas()["d"].sum()
                )
                nonnull = child.map_batches(
                    lambda b: b[b[col].notna()], batch_format="pandas"
                )
                counts = sorted_group_counts(nonnull, [col]).materialize()
                np_join = default_join_partitions()
                if counts.count() == 0:
                    missing_rows = 0
                else:
                    missing = counts.join(
                        ref_keys.map_batches(
                            lambda b: b.rename(columns={refc: "_pk"}),
                            batch_format="pandas",
                        ).repartition(np_join),
                        "left_anti",
                        num_partitions=np_join,
                        on=(col,),
                        right_on=("_pk",),
                    )
                    missing_rows = int(
                        missing.map_batches(
                            lambda b: pd.DataFrame(
                                {"s": [int(b["n"].sum())]}
                            ),
                            batch_format="pandas",
                        ).to_pandas()["s"].sum()
                    )
                out_rows.append(
                    (_rule_name(r), n_null + missing_rows, n_total)
                )

    return (
        pd.DataFrame(out_rows, columns=["rule", "violations", "n_checked"])
        .sort_values("rule")
        .reset_index(drop=True)
    )
