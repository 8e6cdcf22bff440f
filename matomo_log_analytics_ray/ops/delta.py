"""Keyed dataset maintenance: upsert and snapshot diff.

The table-maintenance pair every incremental pipeline needs (the
reference's analog is its manifest insert-if-absent / status upsert,
/root/reference/libs/lib_database.py:73-94, generalized from file rows
to arbitrary keyed datasets):

* ``upsert``        new rows override old rows by key (SCD-1 merge):
                    old ANTI-JOIN delta, UNION delta. The delta is
                    usually small, so its key set broadcasts via
                    ray.put and the anti-filter fuses into the base
                    scan (no shuffle of the base); beyond the limit it
                    falls back to a hash left_anti join.
* ``snapshot_diff`` change-data-capture between two keyed snapshots:
                    (key, change) rows with change in
                    {added, removed, changed} — unchanged rows are
                    dropped. One full_outer hash join + a vectorized
                    comparison; only keys and compared columns move.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data

from . import default_join_partitions


def upsert(
    base: "ray.data.Dataset",
    delta: "ray.data.Dataset",
    key_col: str,
    broadcast_limit: int = 5_000_000,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Rows of ``base`` whose key is absent from ``delta``, plus all of
    ``delta`` — the standard keyed merge (last writer wins; schemas
    must match)."""
    keys = delta.map_batches(
        lambda b: b[[key_col]], batch_format="pandas"
    ).materialize()
    if keys.count() <= broadcast_limit:
        arr = np.sort(keys.to_pandas()[key_col].to_numpy())
        ref = ray.put(arr)

        def anti(b: pd.DataFrame) -> pd.DataFrame:
            a = ray.get(ref)
            if len(a) == 0 or len(b) == 0:
                return b
            v = b[key_col].to_numpy()
            pos = np.minimum(np.searchsorted(a, v), len(a) - 1)
            return b[a[pos] != v]

        kept = base.map_batches(anti, batch_format="pandas")
    else:
        if num_partitions is None:
            num_partitions = default_join_partitions()
        kept = base.join(
            keys.map_batches(
                lambda b: b.rename(columns={key_col: "_dk"}), batch_format="pandas"
            ).repartition(num_partitions),
            "left_anti",
            num_partitions=num_partitions,
            on=(key_col,),
            right_on=("_dk",),
        )
    return kept.union(delta)


def snapshot_diff(
    old: "ray.data.Dataset",
    new: "ray.data.Dataset",
    key_col: str,
    compare_cols: list[str],
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """(key, change) with change in {'added', 'removed', 'changed'};
    keys present in both snapshots with equal ``compare_cols`` emit
    nothing. Equality is exact (use pre-rounded columns for floats)."""
    if num_partitions is None:
        num_partitions = default_join_partitions()

    # Capture the key's dtype up front so classify can restore it after
    # the join (null-padding a full_outer side upcasts ints to float).
    sch = new.schema()
    key_np_dtype = sch.types[sch.names.index(key_col)].to_pandas_dtype()

    # Ray's full_outer join coalesces both key columns into the LEFT
    # key and drops the right one, so presence must be tracked with
    # explicit marker columns, not key nullness — and the key itself is
    # carried redundantly as a VALUE column on each side (`o_kv` /
    # `n_kv`) and coalesced explicitly in classify, so we never depend
    # on which column a Ray version coalesces the join key into.
    def side(ds, tag):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            out = b[[key_col, *compare_cols]].copy()
            out = out.rename(
                columns={key_col: f"{tag}_k", **{c: f"{tag}_{c}" for c in compare_cols}}
            )
            out[f"{tag}_kv"] = b[key_col].to_numpy()
            out[f"{tag}_present"] = np.int8(1)
            return out

        return ds.map_batches(fn, batch_format="pandas").repartition(num_partitions)

    joined = side(old, "o").join(
        side(new, "n"),
        "full_outer",
        num_partitions=num_partitions,
        on=("o_k",),
        right_on=("n_k",),
    )

    def classify(b: pd.DataFrame) -> pd.DataFrame:
        in_old = b["o_present"].notna()
        in_new = b["n_present"].notna()
        added = ~in_old & in_new
        removed = in_old & ~in_new
        changed = in_old & in_new
        if changed.any():
            same = np.ones(len(b), dtype=bool)
            for c in compare_cols:
                o = b[f"o_{c}"]
                n = b[f"n_{c}"]
                same &= (o == n) | (o.isna() & n.isna())
            changed &= ~same
        key = b["o_kv"].where(in_old, b["n_kv"])  # explicit coalesce
        out = pd.DataFrame({key_col: key, "change": None})
        out.loc[added, "change"] = "added"
        out.loc[removed, "change"] = "removed"
        out.loc[changed, "change"] = "changed"
        out = out[out["change"].notna()]
        out[key_col] = out[key_col].astype(key_np_dtype)
        return out

    return joined.map_batches(classify, batch_format="pandas")
