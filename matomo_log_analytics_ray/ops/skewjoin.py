"""Skew-aware distributed inner join: heavy hitters -> salt -> join.

A hash join (``Dataset.join``) routes every row of a key to ONE reduce
partition; a hot key (15% of a 100 TB fact table is 15 TB) lands on one
aggregator and the join runs at single-node speed no matter how many
partitions were requested. The classic fix, done Ray-Data-first:

1. detect    — exact heavy hitters on the LEFT key via the Misra-Gries
               sketch + verify passes (ops/heavyhitters.py): two
               streaming ``map_batches`` scans, O(1/phi) driver state,
               NO shuffle of the fact table.
2. salt      — broadcast the hot-key array (``ray.put`` once, read per
               task). Left rows with hot keys get ``__salt`` =
               arange % k_salts within each batch (hot rows spread
               uniformly over k_salts reduce partitions without RNG —
               deterministic, resumable); all other rows get salt 0.
3. replicate — right rows with hot keys are repeated once per salt
               value (k_salts copies); other rows get salt 0. Only the
               hot slice of the SMALL side replicates — O(k_salts x
               hot right rows) extra bytes, never the fact table.
4. join      — one ``Dataset.join`` on (key, __salt); drop __salt.

With no hot keys detected the op degenerates to a plain hash join (no
salt columns, no extra passes beyond the detection scan). Inner-join
semantics match ANSI SQL: NULL keys never match and are filtered from
both sides before the join.

Tiny-cluster note: Ray's ``Dataset.join`` (ray 2.49) deadlocks on
2-3-CPU clusters — the hash-shuffle aggregator actors plus one
in-flight 1-CPU map task starve every other operator in the plan
(reproduced: a 3.2M x 3M inner join hangs at num_cpus=2, finishes in
10.6 s at num_cpus=4; see pipelines/prepare.MIN_JOIN_CPUS, whose
semi-join broadcasts instead below 4 CPUs). This op targets real
multi-node clusters; don't run it on a < 4-CPU session.

Cost note: detection streams the left input twice (sketch + verify)
and the join streams it a third time, so pass a cheap-to-recompute
dataset (a pruned ``read_parquet`` projection) or materialize small
inputs first. ops/groupagg.py is the grouped-aggregation sibling of
this pattern; ops/annjoin.py applies the same salting to hot IVF
clusters.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd

import ray
import ray.data

from .heavyhitters import heavy_hitters

_SALT = "__salt"


def _drop_null_keys(col: str):
    """Arrow-native row filter: keep rows whose key is non-null."""
    import pyarrow.compute as pc

    def fn(t):
        return t.filter(pc.is_valid(t.column(col)))

    return fn


def skew_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: str,
    right_on: Optional[str] = None,
    *,
    k_salts: int = 8,
    phi: float = 0.01,
    num_partitions: Optional[int] = None,
) -> "ray.data.Dataset":
    """Inner join ``left`` (the large, possibly skewed side) with
    ``right`` on ``on`` = ``right_on`` (default: same name), spreading
    any key holding >= ``phi`` of left's rows over ``k_salts`` reduce
    partitions. Non-key column names must be disjoint across sides
    (the convention of every join call in this package)."""
    if right_on is None:
        right_on = on
    if num_partitions is None:
        from . import default_join_partitions

        num_partitions = default_join_partitions()

    # SQL inner-join semantics: NULL keys match nothing.
    left = left.map_batches(_drop_null_keys(on), batch_format="pyarrow")
    right = right.map_batches(
        _drop_null_keys(right_on), batch_format="pyarrow"
    )

    hot = heavy_hitters(left, on, phi=phi)
    if len(hot) == 0:
        return left.join(
            right, "inner", num_partitions=num_partitions,
            on=(on,), right_on=(right_on,),
        )

    hot_ref = ray.put(np.sort(hot[on].to_numpy()))
    k = int(k_salts)

    def salt_left(b: pd.DataFrame) -> pd.DataFrame:
        keys = b[on].to_numpy()
        hk = ray.get(hot_ref)
        pos = np.searchsorted(hk, keys)
        pos[pos >= len(hk)] = len(hk) - 1
        is_hot = hk[pos] == keys
        salt = np.zeros(len(b), dtype=np.int64)
        salt[is_hot] = np.arange(int(is_hot.sum()), dtype=np.int64) % k
        out = b.copy()
        out[_SALT] = salt
        return out

    def replicate_right(b: pd.DataFrame) -> pd.DataFrame:
        keys = b[right_on].to_numpy()
        hk = ray.get(hot_ref)
        pos = np.searchsorted(hk, keys)
        pos[pos >= len(hk)] = len(hk) - 1
        is_hot = hk[pos] == keys
        rep = np.where(is_hot, k, 1)
        idx = np.repeat(np.arange(len(b)), rep)
        out = b.iloc[idx].reset_index(drop=True)
        # per-source-row 0..rep-1 counter = global arange minus each
        # row's replication start offset
        starts = np.repeat(np.cumsum(rep) - rep, rep)
        out[_SALT] = (np.arange(len(idx)) - starts).astype(np.int64)
        return out

    l_salted = left.map_batches(salt_left, batch_format="pandas")
    r_salted = right.map_batches(replicate_right, batch_format="pandas")
    joined = l_salted.join(
        r_salted,
        "inner",
        num_partitions=num_partitions,
        on=(on, _SALT),
        right_on=(right_on, _SALT),
    )
    return joined.drop_columns([_SALT])
