"""Sessionization: split each user's event stream at inactivity gaps.

The streaming-window analog the reference's batch control plane never
needed (SURVEY.md "beyond-reference" ops). Shape: ONE range sort by
(user, ts), then per-block vectorized run reduction — numpy cumsum over
gap/user-change flags — instead of ``groupby(user).map_groups`` (which
pays ~1 ms of Ray per group; at 10^8 users that is days). Same
interior/edge discipline as ops/dedup.sorted_group_counts: users fully
interior to a block are sessionized in-block; the first/last user of
every block may straddle a boundary, so their rows are PRE-REDUCED to
per-session partials (user, start, end, n) — O(sessions) per block, not
O(rows) — and one merge pass stitches partials whose boundary gap is
<= gap_s. A single user dominating the whole input therefore funnels
only its session partials through the merge, never its raw events.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data

DEFAULT_GAP_S = 30 * 60.0

_COLS = ["user_id", "session_idx", "session_start", "n_events"]


def _session_partials(
    user: np.ndarray, ts: pd.Series, gap_s: float
) -> pd.DataFrame:
    """Rows sorted by (user, ts) -> one row per maximal in-block
    session: (user_id, session_start, session_end, n_events)."""
    n = len(user)
    if n == 0:
        return pd.DataFrame(
            {
                "user_id": user,
                "session_start": ts.reset_index(drop=True),
                "session_end": ts.reset_index(drop=True),
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
    tsv = ts.to_numpy()
    return pd.DataFrame(
        {
            "user_id": user[starts],
            "session_start": tsv[starts],
            "session_end": tsv[ends - 1],
            "n_events": (ends - starts).astype("int64"),
        }
    )


def _finalize(partials: pd.DataFrame, gap_s: float) -> pd.DataFrame:
    """Merge time-adjacent session partials (same user, boundary gap
    <= gap_s) and assign 0-based per-user session_idx. Partials must
    cover disjoint time ranges per user (guaranteed by the range
    sort), so ordering by (user, start) reconstructs event order."""
    if len(partials) == 0:
        return pd.DataFrame(
            {
                "user_id": partials["user_id"],
                "session_idx": pd.Series([], dtype="int64"),
                "session_start": partials["session_start"],
                "n_events": pd.Series([], dtype="int64"),
            }
        )
    p = partials.sort_values(["user_id", "session_start"], kind="mergesort")
    user = p["user_id"].to_numpy()
    start = p["session_start"].to_numpy()
    end = p["session_end"].to_numpy()
    n = len(p)
    new_user = np.ones(n, dtype=bool)
    new_user[1:] = user[1:] != user[:-1]
    bgap = (
        (start[1:] - end[:-1]).astype("timedelta64[us]").astype(np.int64)
        / 1e6
    )
    new_sess = new_user.copy()
    new_sess[1:] |= bgap > gap_s
    sid = np.cumsum(new_sess) - 1
    starts = np.flatnonzero(new_sess)
    s_user = user[starts]
    nsess = len(starts)
    sess_new_user = new_user[starts]
    first_idx = np.maximum.accumulate(
        np.where(sess_new_user, np.arange(nsess), 0)
    )
    n_events = np.bincount(sid, weights=p["n_events"].to_numpy()).astype("int64")
    return pd.DataFrame(
        {
            "user_id": s_user,
            "session_idx": (np.arange(nsess) - first_idx).astype("int64"),
            "session_start": start[starts],
            "n_events": n_events,
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
            out = _session_partials(user, ts, gap_s)
            out["session_idx"] = pd.Series([], dtype="int64")
            out["kind"] = pd.Series([], dtype=object)
            return out[
                ["user_id", "session_idx", "session_start", "session_end",
                 "n_events", "kind"]
            ]
        change = np.ones(n, dtype=bool)
        change[1:] = user[1:] != user[:-1]
        run_id = np.cumsum(change) - 1
        last = run_id[-1]
        starts = np.flatnonzero(change)
        # interior users: runs 1..last-1 (a contiguous row range) —
        # complete in-block, so finalize them HERE (session_idx must be
        # assigned before Ray can dynamically split this output block;
        # a downstream per-batch finalize would restart idx mid-user)
        lo, hi = (starts[1], starts[last]) if last >= 2 else (0, 0)
        done = _finalize(
            _session_partials(
                user[lo:hi], ts.iloc[lo:hi].reset_index(drop=True), gap_s
            ),
            gap_s,
        )
        done["session_end"] = done["session_start"]  # schema union filler
        done["kind"] = "done"
        # edge users (first/last run): pre-reduce to per-session
        # partials — O(sessions), even when one user spans every block
        frames = [done]
        for r in ([0] if last == 0 else [0, last]):
            elo, ehi = starts[r], (starts[r + 1] if r + 1 <= last else n)
            edge = _session_partials(
                user[elo:ehi], ts.iloc[elo:ehi].reset_index(drop=True), gap_s
            )
            edge["session_idx"] = np.int64(-1)
            edge["kind"] = "edge"
            frames.append(edge)
        return pd.concat(frames, ignore_index=True)[
            ["user_id", "session_idx", "session_start", "session_end",
             "n_events", "kind"]
        ]

    tagged = sorted_ds.map_batches(block_fn, batch_format="pandas").materialize()

    # split-safe: pure row filter + projection, no per-batch state
    done = tagged.map_batches(
        lambda b: b[b["kind"] == "done"][_COLS], batch_format="pandas"
    )

    def edge_rows(b: pd.DataFrame) -> pd.DataFrame:
        return b[b["kind"] == "edge"][
            ["user_id", "session_start", "session_end", "n_events"]
        ]

    edges = (
        tagged.map_batches(edge_rows, batch_format="pandas")
        .repartition(1)
        .map_batches(lambda b: _finalize(b, gap_s), batch_format="pandas")
    )
    return done.union(edges)
