"""ops/funnel: windowed funnel, cohort retention and debounce match
pandas references across block boundaries (users whose event runs
straddle blocks exercise the edge/boundary machinery)."""

import numpy as np
import pandas as pd
import ray.data

from matomo_log_analytics_ray.ops import funnel

US = 1_000_000
HOUR_US = 3600 * US


def _make_events(n_users=12, n_events=600, seed=11):
    rng = np.random.default_rng(seed)
    base = pd.Timestamp("2024-03-01")
    types = np.array(["signup", "click", "purchase", "view"])
    return pd.DataFrame(
        {
            "event_id": np.arange(n_events, dtype="int64"),
            "user_id": rng.integers(0, n_users, size=n_events),
            "event_type": types[rng.integers(0, 4, size=n_events)],
            "ts": base
            + pd.to_timedelta(
                np.sort(rng.integers(0, 20 * 24 * 3600, size=n_events)), unit="s"
            ),
        }
    )


def _funnel_reference(df, steps, within_us):
    counts = []
    conv = {}  # user -> conversion ts at current step
    for k, step in enumerate(steps):
        sub = df[df["event_type"] == step]
        nxt = {}
        for uid, g in sub.groupby("user_id"):
            ts = g["ts"].sort_values()
            if k == 0:
                nxt[uid] = ts.iloc[0]
            elif uid in conv:
                after = ts[ts > conv[uid]]
                if within_us is not None:
                    lim = conv[uid] + pd.Timedelta(within_us, unit="us")
                    after = after[after <= lim]
                if len(after):
                    nxt[uid] = after.iloc[0]
        conv = nxt
        counts.append((step, k + 1, len(conv)))
    return pd.DataFrame(counts, columns=["step", "step_idx", "users"])


def test_funnel_counts_matches_reference():
    df = _make_events()
    steps = ["signup", "click", "purchase"]
    want = _funnel_reference(df, steps, within_us=24 * HOUR_US)
    for nblocks in (1, 5):
        ds = ray.data.from_pandas(df).repartition(nblocks)
        got = funnel.funnel_counts(ds, steps, within_us=24 * HOUR_US)
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want, check_dtype=False
        )


def test_funnel_unwindowed_monotone():
    df = _make_events(seed=5)
    got = funnel.funnel_counts(
        ray.data.from_pandas(df), ["signup", "click", "purchase"]
    )
    u = got["users"].to_numpy()
    assert (u[:-1] >= u[1:]).all()


def _cohort_reference(df, max_offset):
    p = df.assign(d=df["ts"].dt.floor("D"))[["user_id", "d"]].drop_duplicates()
    first = p.groupby("user_id")["d"].min().rename("cd")
    j = p.join(first, on="user_id")
    off = (j["d"] - j["cd"]).dt.days
    j = j.assign(day_offset=off)[off <= max_offset]
    out = (
        j.groupby([j["cd"].dt.strftime("%Y-%m-%d"), "day_offset"])
        .size()
        .rename("users")
        .reset_index()
        .rename(columns={"cd": "cohort_day"})
    )
    return out


def _canon(df, cols):
    return (
        df.sort_values(cols).reset_index(drop=True).astype({c: "int64" for c in cols if c != "cohort_day"})
    )


def test_cohort_retention_matches_reference():
    df = _make_events(n_users=9, n_events=500, seed=3)
    want = _canon(_cohort_reference(df, 30), ["cohort_day", "day_offset"])
    for nblocks in (1, 4):
        ds = ray.data.from_pandas(df[["user_id", "ts"]]).repartition(nblocks)
        got = _canon(
            funnel.cohort_retention(ds, max_offset=30).to_pandas(),
            ["cohort_day", "day_offset"],
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def _debounce_reference(df, gap_us):
    keep = []
    for _, g in df.sort_values(["user_id", "event_type", "ts", "event_id"]).groupby(
        ["user_id", "event_type"]
    ):
        prev = None
        for _, row in g.iterrows():
            if prev is None or (row["ts"] - prev).total_seconds() * US >= gap_us:
                keep.append(row["event_id"])
            prev = row["ts"]
    return sorted(keep)


def test_debounce_matches_reference():
    df = _make_events(n_users=6, n_events=400, seed=9)
    gap = 12 * HOUR_US
    want = _debounce_reference(df, gap)
    for nblocks in (1, 6):
        ds = ray.data.from_pandas(df).repartition(nblocks)
        got = sorted(
            funnel.debounce(ds, gap_us=gap).to_pandas()["event_id"].tolist()
        )
        assert got == want


def test_debounce_ties_kept_by_event_id_order():
    # two identical timestamps: the lower event_id is the predecessor,
    # the higher one sees gap 0 and is dropped
    base = pd.Timestamp("2024-01-01")
    df = pd.DataFrame(
        {
            "event_id": [1, 2],
            "user_id": [7, 7],
            "event_type": ["click", "click"],
            "ts": [base, base],
        }
    )
    got = funnel.debounce(
        ray.data.from_pandas(df), gap_us=1
    ).to_pandas()["event_id"].tolist()
    assert got == [1]
