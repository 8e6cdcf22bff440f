"""ops/quantiles: exact histogram-refinement selection equals the
quantile_disc convention (rank ceil(n*q)-1) on every distribution
shape, including heavy ties and multi-level refinement."""

import math

import numpy as np
import pandas as pd
import ray.data

from matomo_log_analytics_ray.ops import quantiles


def _reference(df, qs):
    rows = []
    for g, grp in df.groupby("g"):
        v = np.sort(grp["v"].dropna().to_numpy())
        for q in qs:
            rows.append((g, q, v[max(math.ceil(len(v) * q) - 1, 0)]))
    return pd.DataFrame(rows, columns=["g", "q", "value"])


def _canon(df):
    return df.sort_values(["g", "q"]).reset_index(drop=True).astype({"value": "float64"})


def _check(df, qs=(0.25, 0.5, 0.75, 0.9), **kw):
    got = quantiles.grouped_quantiles(
        ray.data.from_pandas(df).repartition(6), "g", "v", qs=qs, **kw
    )
    pd.testing.assert_frame_equal(_canon(got), _canon(_reference(df, qs)))


def test_continuous_values():
    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {"g": rng.integers(0, 4, size=2000), "v": rng.normal(size=2000)}
    )
    _check(df)


def test_heavy_ties_point_mass():
    # 90% of one group is a single repeated value: the uniques pass
    # must collapse the point mass, and the median IS that value
    rng = np.random.default_rng(4)
    a = np.full(900, 7.25)
    b = rng.uniform(0, 1, size=100)
    df = pd.DataFrame(
        {"g": ["x"] * 1000 + ["y"] * 200,
         "v": np.concatenate([a, b, rng.uniform(5, 9, size=200)])}
    )
    _check(df)


def test_multi_level_refinement():
    # tiny bins + tiny max_collect force both histogram levels AND the
    # uniques fallback on a skewed long-tail distribution
    rng = np.random.default_rng(5)
    df = pd.DataFrame({"g": np.zeros(5000, dtype=np.int64),
                       "v": rng.pareto(1.2, size=5000)})
    _check(df, n_bins=4, max_collect=10)


def test_single_row_group_and_nulls():
    df = pd.DataFrame(
        {"g": ["a", "a", "b"], "v": [3.0, None, 42.0]}
    )
    got = quantiles.grouped_quantiles(
        ray.data.from_pandas(df), "g", "v", qs=(0.5,)
    )
    got = got.set_index("g")["value"]
    assert got["a"] == 3.0 and got["b"] == 42.0
