"""ops/delta: keyed upsert (last-writer-wins) and snapshot diff (CDC)
vs pandas references, both broadcast and join paths."""

import numpy as np
import pandas as pd
import ray.data

from matomo_log_analytics_ray.ops import delta


def test_upsert_overrides_by_key_both_paths():
    base = pd.DataFrame(
        {"k": np.arange(10, dtype=np.int64), "v": np.arange(10, dtype=np.int64)}
    )
    dlt = pd.DataFrame({"k": np.array([3, 7, 20], dtype=np.int64),
                        "v": np.array([300, 700, 2000], dtype=np.int64)})
    want = {**dict(zip(base.k, base.v)), **dict(zip(dlt.k, dlt.v))}
    for limit in (5_000_000, 0):  # broadcast path, then forced join path
        out = (
            delta.upsert(
                ray.data.from_pandas(base).repartition(3),
                ray.data.from_pandas(dlt),
                "k",
                broadcast_limit=limit,
            )
            .to_pandas()
            .sort_values("k")
        )
        assert dict(zip(out.k, out.v)) == want


def test_snapshot_diff_classifies():
    old = pd.DataFrame({"k": np.array([1, 2, 3, 4], dtype=np.int64),
                        "v": np.array([10, 20, 30, 40], dtype=np.int64)})
    new = pd.DataFrame({"k": np.array([2, 3, 4, 5], dtype=np.int64),
                        "v": np.array([20, 31, 40, 50], dtype=np.int64)})
    out = (
        delta.snapshot_diff(
            ray.data.from_pandas(old).repartition(2),
            ray.data.from_pandas(new).repartition(2),
            "k",
            ["v"],
        )
        .to_pandas()
        .sort_values("k")
    )
    got = dict(zip(out.k, out.change))
    assert got == {1: "removed", 3: "changed", 5: "added"}  # 2,4 unchanged
