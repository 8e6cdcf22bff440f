"""Count-min sketch (ops/cms.py): one-sided error, the 2N/w bound,
exact merge / partition invariance, and parity with the exact counts."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from matomo_log_analytics_ray.ops import cms


def _zipf_frame(n=20_000, n_keys=500, seed=11):
    rng = np.random.default_rng(seed)
    keys = rng.zipf(1.3, size=n) % n_keys
    return pd.DataFrame({"k": keys.astype(np.int64)})


def test_one_sided_and_bounded_error():
    df = _zipf_frame()
    exact = df["k"].value_counts()
    ds = ray.data.from_pandas(df)
    got = cms.cms_key_estimates(ds, "k", exact.index.to_numpy())
    est = dict(zip(got["k"], got["est_count"]))
    n = len(df)
    for key, true in exact.items():
        assert est[key] >= true, (key, est[key], true)
        assert est[key] - true <= 2 * n / cms.WIDTH + 1, (key, est[key], true)


def test_heavy_keys_near_exact():
    # the fixture's heavy keys dominate their cells; estimates must be
    # within the additive bound, i.e. relatively tight for hot keys
    df = _zipf_frame()
    exact = df["k"].value_counts()
    ds = ray.data.from_pandas(df)
    top = exact.head(5)
    got = cms.cms_key_estimates(ds, "k", top.index.to_numpy())
    est = dict(zip(got["k"], got["est_count"]))
    for key, true in top.items():
        assert est[key] <= true * 1.05 + 20


def test_merge_is_exact_addition():
    df = _zipf_frame()
    a, b = df.iloc[:7000], df.iloc[7000:]
    g_all = cms.cms_sketch(ray.data.from_pandas(df), "k")
    g_a = cms.cms_sketch(ray.data.from_pandas(a), "k")
    g_b = cms.cms_sketch(ray.data.from_pandas(b), "k")
    np.testing.assert_array_equal(g_all, g_a + g_b)


def test_partition_invariance():
    df = _zipf_frame(n=5000)
    g1 = cms.cms_sketch(ray.data.from_pandas(df), "k")
    g2 = cms.cms_sketch(ray.data.from_pandas(df).repartition(17), "k")
    np.testing.assert_array_equal(g1, g2)


def test_string_keys_and_nulls():
    df = pd.DataFrame({"k": ["a", "b", "a", None, "c", "a", None]})
    ds = ray.data.from_pandas(df)
    got = cms.cms_key_estimates(ds, "k", ["a", "b", "c", "zzz"])
    est = dict(zip(got["k"], got["est_count"]))
    # tiny stream, wide grid: estimates are exact; nulls not counted
    assert est["a"] == 3 and est["b"] == 1 and est["c"] == 1
    assert est["zzz"] == 0


def test_estimate_alignment_with_null_keys():
    df = pd.DataFrame({"k": [1, 1, 2, 3]})
    grid = cms.cms_sketch(ray.data.from_pandas(df), "k")
    est = cms.cms_estimate(grid, pd.Series([1, None, 2]))
    # positionally aligned: 3 estimates for 3 keys, null -> 0
    assert len(est) == 3
    assert est[0] == 2 and est[1] == 0 and est[2] == 1


def test_empty_and_bad_depth():
    ds = ray.data.from_pandas(pd.DataFrame({"k": pd.Series([], dtype="int64")}))
    grid = cms.cms_sketch(ds, "k")
    assert grid.sum() == 0
    with pytest.raises(ValueError):
        cms.cms_sketch(ds, "k", depth=99)
