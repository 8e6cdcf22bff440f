"""Sessionization: split each user's event stream at inactivity gaps.

The streaming-window analog the reference's batch control plane never
needed (SURVEY.md "beyond-reference" ops). Shape: ONE range sort by
(user, ts), then per-block vectorized run reduction — numpy cumsum over
gap/user-change flags — instead of ``groupby(user).map_groups`` (which
pays ~1 ms of Ray per group; at 10^8 users that is days). Same
interior/edge discipline as ops/dedup.sorted_group_counts: users fully
interior to a block are sessionized in-block; the first/last user of
every block may straddle a boundary, so their raw (user, ts) rows are
forwarded to one final merge pass (<= 2 users per block — sessions are
order-sensitive, so edge rows cannot be pre-reduced further; a single
user dominating the whole input is the one skew case this funnels).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data

DEFAULT_GAP_S = 30 * 60.0


def _sessions_vec(user: np.ndarray, ts: pd.Series, gap_s: float) -> pd.DataFrame:
    """Vectorized sessionization of rows already sorted by (user, ts).
    Returns one row per session: (user_id, session_idx, session_start,
    n_events); session_idx is 0-based per user in time order."""
    n = len(user)
    if n == 0:
        return pd.DataFrame(
            {
                "user_id": user,
                "session_idx": pd.Series([], dtype="int64"),
                "session_start": ts.reset_index(drop=True),
                "n_events": pd.Series([], dtype="int64"),
            }
        )
    new_user = np.ones(n, dtype=bool)
    new_user[1:] = user[1:] != user[:-1]
    gap = ts.diff().dt.total_seconds().to_numpy()
    new_sess = new_user.copy()
    new_sess[1:] |= gap[1:] > gap_s
    starts = np.flatnonzero(new_sess)
    ends = np.append(starts[1:], n)
    s_user = user[starts]
    nsess = len(starts)
    sess_new_user = new_user[starts]
    first_idx = np.maximum.accumulate(
        np.where(sess_new_user, np.arange(nsess), 0)
    )
    return pd.DataFrame(
        {
            "user_id": s_user,
            "session_idx": (np.arange(nsess) - first_idx).astype("int64"),
            "session_start": ts.to_numpy()[starts],
            "n_events": (ends - starts).astype("int64"),
        }
    )


def sessionize(
    ds: "ray.data.Dataset",
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_s: float = DEFAULT_GAP_S,
) -> "ray.data.Dataset":
    """One row per (user, session): session_idx, session_start, n_events."""
    sorted_ds = ds.sort([user_col, ts_col])

    def block_fn(b: pd.DataFrame) -> pd.DataFrame:
        n = len(b)
        user = b[user_col].to_numpy()
        ts = b[ts_col]
        if n == 0:
            out = _sessions_vec(user, ts, gap_s)
            out["kind"] = pd.Series([], dtype=object)
            return out
        change = np.ones(n, dtype=bool)
        change[1:] = user[1:] != user[:-1]
        run_id = np.cumsum(change) - 1
        last = run_id[-1]
        starts = np.flatnonzero(change)
        # interior users: runs 1..last-1 (a contiguous row range)
        lo, hi = (starts[1], starts[last]) if last >= 2 else (0, 0)
        done = _sessions_vec(
            user[lo:hi], ts.iloc[lo:hi].reset_index(drop=True), gap_s
        )
        done["kind"] = "done"
        # edge users: raw (user, ts) rows forwarded (ts rides in
        # session_start to keep one schema)
        edge_mask = (run_id == 0) | (run_id == last)
        edges = pd.DataFrame(
            {
                "user_id": user[edge_mask],
                "session_idx": np.int64(-1),
                "session_start": ts.to_numpy()[edge_mask],
                "n_events": np.int64(0),
                "kind": "edge",
            }
        )
        return pd.concat([done, edges], ignore_index=True)

    tagged = sorted_ds.map_batches(block_fn, batch_format="pandas").materialize()
    done = tagged.map_batches(
        lambda b: b[b["kind"] == "done"][
            ["user_id", "session_idx", "session_start", "n_events"]
        ],
        batch_format="pandas",
    )

    def edge_sessions(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return b[["user_id", "session_idx", "session_start", "n_events"]]
        b = b.sort_values(["user_id", "session_start"], kind="mergesort")
        return _sessions_vec(
            b["user_id"].to_numpy(),
            b["session_start"].reset_index(drop=True),
            gap_s,
        )

    edges = (
        tagged.map_batches(
            lambda b: b[b["kind"] == "edge"][
                ["user_id", "session_idx", "session_start", "n_events"]
            ],
            batch_format="pandas",
        )
        .repartition(1)
        .map_batches(edge_sessions, batch_format="pandas")
    )
    return done.union(edges)
