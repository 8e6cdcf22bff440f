"""ops/bloom: no false negatives ever, false-positive rate within the
sizing bound, deterministic across partitionings."""

import numpy as np
import pandas as pd
import ray
import ray.data

from matomo_log_analytics_ray.ops import bloom


def test_no_false_negatives_and_fp_bound():
    rng = np.random.default_rng(71)
    build_keys = rng.choice(10**9, size=20_000, replace=False).astype(np.int64)
    build = pd.DataFrame({"k": build_keys})
    ref, m = bloom.build_bloom(
        ray.data.from_pandas(build).repartition(5), "k", n_keys_hint=20_000
    )
    # probe: half members, half guaranteed non-members
    non_members = (rng.choice(10**9, size=20_000, replace=False) + 10**9).astype(
        np.int64
    )
    probe = pd.DataFrame(
        {"k": np.concatenate([build_keys[:10_000], non_members])}
    )
    kept = bloom.prefilter(
        ray.data.from_pandas(probe).repartition(4), "k", ref, m
    ).to_pandas()
    kept_set = set(kept["k"].tolist())
    # every true member survives
    assert all(int(k) in kept_set for k in build_keys[:10_000])
    # FP rate: ~0.2% expected at 16 bits/key, assert a lax 1%
    fps = sum(1 for k in non_members if int(k) in kept_set)
    assert fps / len(non_members) < 0.01


def test_prefiltered_semi_join_is_exact():
    rng = np.random.default_rng(72)
    left = pd.DataFrame({"k": rng.integers(0, 5000, size=30_000).astype(np.int64),
                         "x": np.arange(30_000)})
    right = pd.DataFrame({"k": np.arange(0, 5000, 7, dtype=np.int64)})
    ref, m = bloom.build_bloom(ray.data.from_pandas(right), "k", len(right))
    pre = bloom.prefilter(ray.data.from_pandas(left).repartition(6), "k", ref, m)
    joined = pre.join(
        ray.data.from_pandas(right), "inner", num_partitions=4,
        on=("k",), right_on=("k",),
    ).to_pandas()
    want = left[left["k"].isin(set(right["k"]))]
    assert sorted(joined["x"].tolist()) == sorted(want["x"].tolist())
