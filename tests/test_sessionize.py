"""ops/sessionize: vectorized sort+run-reduction sessionization equals a
pandas reference regardless of block boundaries (users and sessions
straddling blocks are handled by the edge pass)."""

import numpy as np
import pandas as pd
import ray.data

from matomo_log_analytics_ray.ops import sessionize


def _reference(df: pd.DataFrame, gap_s: float = 1800.0) -> pd.DataFrame:
    rows = []
    for uid, g in df.sort_values(["user_id", "ts"]).groupby("user_id"):
        gap = g["ts"].diff().dt.total_seconds().fillna(0)
        sid = (gap > gap_s).cumsum()
        for idx, (sv, sg) in enumerate(g.groupby(sid)):
            rows.append((uid, idx, sg["ts"].min(), len(sg)))
    return pd.DataFrame(
        rows, columns=["user_id", "session_idx", "session_start", "n_events"]
    )


def _make_events(n_users=7, n_events=400, seed=7):
    rng = np.random.default_rng(seed)
    user = rng.integers(0, n_users, size=n_events)
    base = pd.Timestamp("2024-01-01")
    offs = np.sort(rng.integers(0, 3 * 24 * 3600, size=n_events))
    return pd.DataFrame(
        {"user_id": user, "ts": base + pd.to_timedelta(offs, unit="s")}
    )


def _canon(df):
    return (
        df.sort_values(["user_id", "session_idx"])
        .reset_index(drop=True)
        .astype({"n_events": "int64", "session_idx": "int64"})
    )


def test_sessionize_matches_reference_across_block_boundaries():
    df = _make_events()
    want = _canon(_reference(df))
    for nblocks in (1, 3, 16):
        ds = ray.data.from_pandas(df).repartition(nblocks)
        got = _canon(sessionize.sessionize(ds).to_pandas())
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_sessionize_single_hot_user():
    # one user spanning every block: the whole stream goes through the
    # edge pass and must still sessionize correctly
    base = pd.Timestamp("2024-01-01")
    offs = np.concatenate([np.arange(50) * 60, 100_000 + np.arange(30) * 60])
    df = pd.DataFrame(
        {"user_id": np.zeros(80, dtype=np.int64),
         "ts": base + pd.to_timedelta(offs, unit="s")}
    )
    ds = ray.data.from_pandas(df).repartition(8)
    got = _canon(sessionize.sessionize(ds).to_pandas())
    want = _canon(_reference(df))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
