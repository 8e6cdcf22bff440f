"""ops/heavyhitters: the MG sketch + verify chain returns EXACTLY the
values at or above the phi threshold, on skewed and uniform data, on
any partitioning."""

import math

import numpy as np
import pandas as pd
import ray.data

from matomo_log_analytics_ray.ops import heavyhitters


def _reference(s: pd.Series, phi: float) -> pd.DataFrame:
    vc = s.value_counts()
    thr = math.ceil(phi * len(s))
    out = vc[vc >= thr].rename("n").reset_index()
    out.columns = [s.name, "n"]
    return out.sort_values(s.name).reset_index(drop=True)


def _got(df, col, phi, nblocks):
    return (
        heavyhitters.heavy_hitters(
            ray.data.from_pandas(df).repartition(nblocks), col, phi=phi
        )
        .sort_values(col)
        .reset_index(drop=True)
    )


def test_zipf_skew_exact():
    rng = np.random.default_rng(41)
    df = pd.DataFrame({"v": rng.zipf(1.5, size=30_000) % 1000})
    want = _reference(df["v"], 0.01)
    for nblocks in (1, 8):
        got = _got(df, "v", 0.01, nblocks)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_uniform_none_qualify():
    rng = np.random.default_rng(42)
    # 5000 distinct values over 20k rows at phi=0.01 (thr=200): none pass
    df = pd.DataFrame({"v": rng.integers(0, 5000, size=20_000)})
    got = _got(df, "v", 0.01, 6)
    assert len(got) == 0


def test_boundary_value_not_lost():
    # one value at EXACTLY the threshold among heavy noise: the 3/phi
    # sizing must keep it through both truncations
    phi = 0.1
    n = 1000
    thr = math.ceil(phi * n)  # 100
    vals = np.concatenate(
        [np.full(thr, 7), np.full(450, 1), np.full(450, 2)]
    )
    rng = np.random.default_rng(43)
    rng.shuffle(vals)
    df = pd.DataFrame({"v": vals})
    got = _got(df, "v", phi, 5)
    assert 7 in got["v"].tolist()
    assert got.set_index("v").loc[7, "n"] == thr


def test_nulls_not_counted_in_threshold_base():
    # ADVICE r2: nulls must not inflate n — with 1000 nulls over 1000
    # real rows, a value at exactly ceil(phi * non_null) must qualify
    phi = 0.1
    vals = np.concatenate([np.full(100, 7.0), np.full(450, 1.0), np.full(450, 2.0)])
    rng = np.random.default_rng(44)
    rng.shuffle(vals)
    df = pd.DataFrame({"v": np.concatenate([vals, np.full(1000, np.nan)])})
    df = df.sample(frac=1.0, random_state=7).reset_index(drop=True)
    got = _got(df, "v", phi, 5)
    # threshold base is 1000 non-null rows -> thr=100 -> 7.0 qualifies;
    # with nulls counted the base would be 2000 -> thr=200 -> lost
    assert 7.0 in got["v"].tolist()
