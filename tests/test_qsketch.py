"""Mergeable quantile sketch: rank-error bounds vs exact, weight
conservation, merge invariance, degenerate inputs."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from matomo_log_analytics_ray.ops import qsketch


def _rank_error(data: np.ndarray, q: float, est: float) -> float:
    """Distance from q to the rank INTERVAL est occupies (a tied
    value spans [frac(< est), frac(<= est)]; any q inside is exact)."""
    s = np.sort(data)
    lo = np.searchsorted(s, est, side="left") / len(s)
    hi = np.searchsorted(s, est, side="right") / len(s)
    if lo <= q <= hi:
        return 0.0
    return min(abs(q - lo), abs(q - hi))


@pytest.mark.parametrize("dist", ["uniform", "zipf", "normal"])
def test_sketch_rank_error(dist):
    rng = np.random.default_rng(42)
    n = 200_000
    if dist == "uniform":
        data = rng.random(n) * 1000
    elif dist == "zipf":
        data = rng.zipf(1.5, n).astype(np.float64)
    else:
        data = rng.normal(50, 10, n)
    ds = ray.data.from_pandas(
        [pd.DataFrame({"x": c}) for c in np.array_split(data, 16)]
    )
    out = qsketch.quantile_sketch(ds, "x", qs=(0.5, 0.9, 0.99), k=1024)
    for r in out.itertuples():
        # one level: error <~ 1/(2k); allow 4x slack for ties (zipf)
        assert _rank_error(data, r.q, r.value) < 4 / (2 * 1024), (
            dist, r.q, r.value)


def test_block_summary_weight_conservation():
    rng = np.random.default_rng(0)
    v = rng.random(10_000)
    vals, w = qsketch.block_summary(v, 128)
    assert len(vals) == 128
    assert w.sum() == pytest.approx(10_000)
    # NaNs dropped from the weight budget
    v[::10] = np.nan
    vals, w = qsketch.block_summary(v, 128)
    assert w.sum() == pytest.approx(9_000)


def test_compact_preserves_profile():
    rng = np.random.default_rng(1)
    vals = rng.random(50_000)
    w = np.ones(50_000)
    cv, cw = qsketch.compact_summaries(vals, w, 512)
    assert len(cv) == 512
    assert cw.sum() == pytest.approx(50_000)
    # median of the compacted profile tracks the raw median
    order = np.argsort(cv)
    cum = np.cumsum(cw[order])
    med = cv[order][np.searchsorted(cum, 25_000)]
    assert abs(med - np.median(vals)) < 0.01


def test_merge_invariance():
    """Sketching [A ++ B] and sketching A, B separately then merging
    agree to within the error bound — the mergeability contract."""
    rng = np.random.default_rng(7)
    a, b = rng.random(40_000), rng.random(40_000) + 0.5
    both = np.concatenate([a, b])
    va, wa = qsketch.block_summary(a, 512)
    vb, wb = qsketch.block_summary(b, 512)
    mv, mw = qsketch.compact_summaries(
        np.concatenate([va, vb]), np.concatenate([wa, wb]), 512
    )
    order = np.argsort(mv)
    cum = np.cumsum(mw[order])
    for q in (0.25, 0.5, 0.9):
        est = mv[order][np.searchsorted(cum, q * cum[-1], side="left")]
        assert _rank_error(both, q, est) < 4 / (2 * 512)


def test_degenerate():
    ds = ray.data.from_pandas(pd.DataFrame({"x": [np.nan, np.nan]}))
    out = qsketch.quantile_sketch(ds, "x", qs=(0.5,))
    assert np.isnan(out["value"].iloc[0])
    ds1 = ray.data.from_pandas(pd.DataFrame({"x": [3.0]}))
    out1 = qsketch.quantile_sketch(ds1, "x", qs=(0.5, 0.99))
    assert (out1["value"] == 3.0).all()


def test_hierarchical_compaction_levels():
    """Force the multi-level path with a tiny driver_limit: result
    still within the (levels+1)-scaled bound."""
    rng = np.random.default_rng(3)
    data = rng.random(100_000)
    ds = ray.data.from_pandas(
        [pd.DataFrame({"x": c}) for c in np.array_split(data, 32)]
    )
    out = qsketch.quantile_sketch(
        ds, "x", qs=(0.5, 0.9), k=256, driver_limit=600
    )
    for r in out.itertuples():
        assert _rank_error(data, r.q, r.value) < 4 * 3 / (2 * 256)


def test_grouped_sketch_vs_exact_reduction():
    """k >= every batch -> grouped sketch is exact percentile_disc per
    group (the quantile_sketch_value gate argument, per-group)."""
    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "g": rng.choice(["a", "b", "c"], 30_000),
        "x": rng.random(30_000) * 100,
    })
    ds = ray.data.from_pandas(
        [c for c in np.array_split(df, 8)]
    )
    out = qsketch.grouped_quantile_sketch(
        ds, "g", "x", qs=(0.5, 0.9), k=100_000
    )
    for r in out.itertuples():
        sub = np.sort(df[df["g"] == r.g]["x"].to_numpy())
        exact = sub[int(np.ceil(len(sub) * r.q)) - 1]
        assert r.value == pytest.approx(exact), (r.g, r.q)


def test_grouped_sketch_compaction_bound():
    rng = np.random.default_rng(9)
    df = pd.DataFrame({
        "g": rng.choice(["a", "b"], 120_000),
        "x": rng.normal(0, 1, 120_000),
    })
    ds = ray.data.from_pandas([c for c in np.array_split(df, 24)])
    out = qsketch.grouped_quantile_sketch(
        ds, "g", "x", qs=(0.5, 0.99), k=256, driver_limit=500
    )
    for r in out.itertuples():
        sub = df[df["g"] == r.g]["x"].to_numpy()
        assert _rank_error(sub, r.q, r.value) < 4 * 3 / (2 * 256)


def test_grouped_sketch_all_null_group_kept():
    """A group whose values are ALL NaN must still appear in the
    output with value NaN (the SQL GROUP-BY convention: quantile over
    all NULLs is NULL, not a dropped group)."""
    df = pd.DataFrame({
        "g": ["a"] * 50 + ["b"] * 50,
        "x": list(np.linspace(0, 1, 50)) + [np.nan] * 50,
    })
    ds = ray.data.from_pandas([c for c in np.array_split(df, 4)])
    out = qsketch.grouped_quantile_sketch(ds, "g", "x", qs=(0.5,))
    assert set(out["g"]) == {"a", "b"}
    a = out[out["g"] == "a"]["value"].iloc[0]
    b = out[out["g"] == "b"]["value"].iloc[0]
    assert not np.isnan(a)
    assert np.isnan(b)
    # zero-weight markers must not shift a mixed group's quantiles
    assert abs(a - 0.5) < 0.05


def test_grouped_sketch_compaction_with_empty_blocks():
    """Multi-level compaction path (driver_limit forces sort -> range
    partitioning, which can emit empty blocks) must not raise on
    pd.concat of an empty outs list."""
    rng = np.random.default_rng(11)
    df = pd.DataFrame({
        "g": rng.choice(["a", "b", "c"], 60_000),
        "x": rng.random(60_000),
    })
    ds = ray.data.from_pandas([c for c in np.array_split(df, 16)])
    out = qsketch.grouped_quantile_sketch(
        ds, "g", "x", qs=(0.5,), k=128, driver_limit=200
    )
    assert set(out["g"]) == {"a", "b", "c"}
    for r in out.itertuples():
        sub = df[df["g"] == r.g]["x"].to_numpy()
        assert _rank_error(sub, r.q, r.value) < 4 * 4 / (2 * 128)


from hypothesis import given, settings, strategies as st


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
        min_size=1,
        max_size=5_000,
    ),
    st.integers(min_value=16, max_value=512),
)
def test_summary_plus_compact_error_bound_property(data, k):
    """For ANY value list and k: block_summary -> compact_summaries
    keeps every quantile within the 1/k-per-level rank bound and
    conserves total weight (pure-kernel property, no Ray)."""
    arr = np.asarray(data, dtype=np.float64)
    v, w = qsketch.block_summary(arr, k)
    assert w.sum() == pytest.approx(len(arr))
    cv, cw = qsketch.compact_summaries(v, w, k // 2)
    assert cw.sum() == pytest.approx(len(arr))
    order = np.argsort(cv, kind="mergesort")
    sv, sw = cv[order], cw[order]
    cum = np.cumsum(sw)
    for q in (0.1, 0.5, 0.9):
        pos = int(np.searchsorted(cum, q * cum[-1], side="left"))
        est = sv[min(pos, len(sv) - 1)]
        # two levels (summary + compaction at k/2): 1/(2k) + 1/k,
        # with 4x tie/rounding slack
        assert _rank_error(arr, q, est) <= 4 * (0.5 / k + 1.0 / (k // 2))
