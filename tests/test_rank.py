"""ops/rank: distributed ROW_NUMBER — parity with pandas ranking under
random block boundaries, hot keys spanning blocks, descending order."""

import numpy as np
import pandas as pd
import ray.data

from matomo_log_analytics_ray.ops import rank


def _want(df, by, asc):
    d = df.sort_values(by, ascending=asc, kind="mergesort")
    return d.groupby("k", sort=False).cumcount().add(1).reindex(df.index)


def test_rank_matches_pandas_random_and_hot_key():
    rng = np.random.default_rng(11)
    n = 5000
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 40, size=n),
            "v": rng.integers(0, 1_000_000, size=n),
            "rid": np.arange(n, dtype=np.int64),
        }
    )
    df.loc[: n // 3, "k"] = 7  # hot key spanning many blocks
    want = df.assign(rnk=_want(df, ["k", "v", "rid"], True))
    for nblocks in (1, 16):
        ds = ray.data.from_pandas(df).repartition(nblocks)
        got = (
            rank.grouped_rank(ds, ["k"], ["v", "rid"])
            .to_pandas()
            .sort_values("rid")
            .reset_index(drop=True)
        )
        merged = got.merge(
            want[["rid", "rnk"]], on="rid", suffixes=("_got", "_want")
        )
        assert (merged["rnk_got"] == merged["rnk_want"]).all()


def test_rank_descending():
    df = pd.DataFrame(
        {
            "k": [1, 1, 1, 2],
            "v": [10, 30, 20, 5],
            "rid": np.arange(4, dtype=np.int64),
        }
    )
    ds = ray.data.from_pandas(df).repartition(2)
    got = (
        rank.grouped_rank(ds, ["k"], ["v", "rid"], descending=[True, False])
        .to_pandas()
        .sort_values("rid")
    )
    assert got["rnk"].tolist() == [3, 1, 2, 1]


def test_cumsum_matches_pandas():
    from matomo_log_analytics_ray.ops import rank as rankmod

    rng = np.random.default_rng(3)
    n = 3000
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 20, size=n),
            "v": rng.uniform(0, 10, size=n),
            "rid": np.arange(n, dtype=np.int64),
        }
    )
    df.loc[: n // 2, "k"] = 5  # hot key across blocks
    want = (
        df.sort_values(["k", "v", "rid"])
        .groupby("k", sort=False)["v"]
        .cumsum()
        .reindex(df.sort_values(["k", "v", "rid"]).index)
    )
    want_map = dict(zip(df.sort_values(["k", "v", "rid"])["rid"], want))
    for nblocks in (1, 12):
        ds = ray.data.from_pandas(df).repartition(nblocks)
        got = rankmod.grouped_cumsum(ds, ["k"], ["v", "rid"], "v").to_pandas()
        for rid, s in zip(got["rid"], got["running_sum"]):
            assert abs(s - want_map[rid]) < 1e-8


def test_lag_and_rolling_match_pandas():
    from matomo_log_analytics_ray.ops import window

    rng = np.random.default_rng(8)
    n = 2000
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 10, size=n),
            "v": rng.uniform(0, 100, size=n).round(3),
            "rid": np.arange(n, dtype=np.int64),
        }
    )
    s = df.sort_values(["k", "v", "rid"])
    want_lag = s.groupby("k", sort=False)["v"].shift(1)
    want_roll = (
        s.groupby("k", sort=False)["v"].rolling(3, min_periods=1).mean().round(6)
    )
    lag_map = dict(zip(s["rid"], want_lag))
    roll_map = dict(zip(s["rid"], want_roll.to_numpy()))
    for nblocks in (1, 9):
        ds = ray.data.from_pandas(df).repartition(nblocks)
        got_lag = window.grouped_lag(ds, ["k"], ["v", "rid"], "v").to_pandas()
        for rid, lv in zip(got_lag["rid"], got_lag["lag_val"]):
            w = lag_map[rid]
            assert (pd.isna(lv) and pd.isna(w)) or abs(lv - w) < 1e-9
        got_roll = window.grouped_rolling_mean(
            ds, ["k"], ["v", "rid"], "v", window=3
        ).to_pandas()
        for rid, rv in zip(got_roll["rid"], got_roll["rolling_mean"]):
            assert abs(rv - roll_map[rid]) < 1e-6


def test_percent_rank_composition_matches_pandas(tmp_path):
    """The two-pass r_asc + r_desc - 1 group-size trick == pandas
    groupby rank/size replay, including single-row groups (pct 0)."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(17)
    n = 500
    ev = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": np.concatenate(
                [rng.integers(0, 30, n - 1), np.array([999])]  # singleton
            ),
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(np.arange(n), unit="s"),
            "event_type": "a",
            "props": '{"k": 1}',
            "value": rng.normal(size=n).round(3),
        }
    )
    ev.to_parquet(tmp_path / "events.parquet")
    import __ray_entry__ as e

    out = (
        e._q_percent_rank_events(str(tmp_path))
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    s = ev.sort_values(["user_id", "value", "event_id"]).copy()
    s["r"] = s.groupby("user_id").cumcount() + 1
    s["n"] = s.groupby("user_id")["event_id"].transform("size")
    s["pct_rank"] = np.where(
        s["n"] > 1, (s["r"] - 1) / (s["n"] - 1), 0.0
    ).round(6)
    s["cume_dist"] = (s["r"] / s["n"]).round(6)
    ref = s.sort_values("event_id")[["event_id", "pct_rank", "cume_dist"]].reset_index(drop=True)
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)
