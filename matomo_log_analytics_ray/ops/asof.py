"""Temporal joins the Dataset API lacks: as-of join and range join.

Beyond-reference operators (SURVEY.md "beyond-reference" ops; the
reference control plane, /root/reference/proc, never joins on time).
Both are shaped for 100 TB:

* asof_join    one global range sort of the tagged union by
               (key, ts, side, tie); every left row whose predecessor
               right row lands in the same sorted block is resolved
               in-block with a vectorized forward-fill (numpy
               maximum.accumulate — no per-row Python, no per-group
               task). Only two things cross block boundaries: the
               unresolved HEAD left rows of each block's first key-run,
               and ONE pre-reduced carry row per block (the last right
               row of its last run) — so the final merge task sees
               O(blocks + unresolved heads), not O(rows).
* range_join   point-in-interval join. Intervals of length <= g are
               replicated into the <= 2 buckets of width g they touch;
               points land in exactly one bucket; a hash-partitioned
               Dataset.join on (key, bucket) then an exact filter. No
               all-pairs blow-up: the shuffle moves only (key, bucket,
               id, ts) projections and each interval at most twice.

Skew note: a single key dominating the whole input funnels its
pre-first-right head rows through the merge task; with sane data the
heads are a few rows per block. The carry side is always exactly one
row per block regardless of skew.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data

_SIDE_RIGHT = 0  # sorts before left at equal ts => right.ts <= left.ts matches
_SIDE_LEFT = 1


def _resolve_sorted(
    b: pd.DataFrame, key_col: str
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized forward-fill over rows sorted by (key, ts, side, tie).
    Returns (matched_left_mask, right_row_index_per_row, run_id)."""
    n = len(b)
    key = b[key_col].to_numpy()
    side = b["_side"].to_numpy()
    change = np.ones(n, dtype=bool)
    if n:
        change[1:] = key[1:] != key[:-1]
    run_id = np.cumsum(change) - 1
    starts = np.flatnonzero(change)
    run_start = starts[run_id] if n else np.empty(0, dtype=np.int64)
    # index of the row itself where it is a right row, else -1; a global
    # maximum.accumulate then yields "latest right row at or before me";
    # it is within-key iff >= my run's start (earlier keys sort lower).
    idx = np.where(side == _SIDE_RIGHT, np.arange(n), -1)
    ffill = np.maximum.accumulate(idx) if n else idx
    matched = ffill >= run_start
    return matched, ffill, run_id


def asof_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    key_col: str,
    ts_col: str,
    left_id: str = "event_id",
    right_id: str = "asof_event_id",
    right_vals: list[str] | None = None,
    tie_col: str | None = None,
) -> "ray.data.Dataset":
    """Inner as-of join: for each left row, attach the right row of the
    same key with the greatest ts <= left.ts. Ties on right ts break to
    the greatest ``tie_col`` (default: ``right_id``) so the result is
    deterministic. Output columns: [left_id, ts_col ("asof_ts" of the
    matched right row), right_id, *right_vals]. Unmatched left rows are
    dropped.

    left must have [key_col, ts_col, left_id]; right must have
    [key_col, ts_col, right_id, *right_vals].
    """
    right_vals = right_vals or []
    tie = tie_col or right_id

    # Left-side filler for each right_vals column must be a zero OF THE
    # RIGHT SIDE'S OWN DTYPE, else the union of the two tagged branches
    # produces schema-mismatched blocks (e.g. float 0.0 next to int64).
    rsch = right.schema()
    val_dtypes = {
        c: np.dtype(rsch.types[rsch.names.index(c)].to_pandas_dtype())
        for c in right_vals
    }

    def tag_left(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                key_col: b[key_col],
                ts_col: b[ts_col],
                "_side": np.int8(_SIDE_LEFT),
                "_tie": np.int64(0),
                left_id: b[left_id],
                right_id: np.int64(0),
            }
        )
        for c in right_vals:
            dt = val_dtypes[c]
            if dt.kind in "biufmM":  # numeric / timedelta / datetime
                out[c] = np.zeros(len(b), dtype=dt)
            else:
                out[c] = pd.Series([None] * len(b), dtype=object)
        return out

    def tag_right(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                key_col: b[key_col],
                ts_col: b[ts_col],
                "_side": np.int8(_SIDE_RIGHT),
                "_tie": b[tie].to_numpy(dtype=np.int64),
                left_id: np.int64(0),
                right_id: b[right_id],
            }
        )
        for c in right_vals:
            out[c] = b[c].to_numpy()
        return out

    tagged = left.map_batches(tag_left, batch_format="pandas").union(
        right.map_batches(tag_right, batch_format="pandas")
    )
    return _resolve_tagged(
        tagged, key_col, ts_col, left_id, right_id, right_vals, val_dtypes
    )


def asof_join_self(
    ds: "ray.data.Dataset",
    key_col: str,
    ts_col: str,
    left_mask,
    right_mask,
    id_col: str = "event_id",
    left_id: str = "event_id",
    right_id: str = "asof_event_id",
) -> "ray.data.Dataset":
    """As-of join where both sides are row subsets of ONE dataset
    (e.g. clicks vs purchases of the same event table): a single scan
    emits the tagged union directly — half the read cost of
    ``asof_join`` on two filtered branches of the same source, which
    Ray's tree-shaped plans would execute as two scans. ``left_mask`` /
    ``right_mask`` are pandas-batch -> bool-Series predicates; ties on
    the right break to the greatest id."""

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        lm = left_mask(b).to_numpy(dtype=bool)
        rm = right_mask(b).to_numpy(dtype=bool)
        ids = b[id_col].to_numpy()
        out = pd.DataFrame(
            {
                key_col: np.concatenate([b[key_col].to_numpy()[lm], b[key_col].to_numpy()[rm]]),
                ts_col: np.concatenate([b[ts_col].to_numpy()[lm], b[ts_col].to_numpy()[rm]]),
                "_side": np.concatenate(
                    [np.full(lm.sum(), _SIDE_LEFT, dtype=np.int8),
                     np.full(rm.sum(), _SIDE_RIGHT, dtype=np.int8)]
                ),
                "_tie": np.concatenate(
                    [np.zeros(lm.sum(), dtype=np.int64), ids[rm].astype(np.int64)]
                ),
                left_id: np.concatenate([ids[lm], np.zeros(rm.sum(), dtype=ids.dtype)]),
                right_id: np.concatenate([np.zeros(lm.sum(), dtype=ids.dtype), ids[rm]]),
            }
        )
        return out

    tagged = ds.map_batches(tag, batch_format="pandas")
    return _resolve_tagged(tagged, key_col, ts_col, left_id, right_id, [])


def _zeros_of(dt: np.dtype, n: int):
    if dt.kind in "biufmM":
        return np.zeros(n, dtype=dt)
    return pd.Series([None] * n, dtype=object)


def _resolve_tagged(
    tagged: "ray.data.Dataset",
    key_col: str,
    ts_col: str,
    left_id: str,
    right_id: str,
    right_vals: list[str],
    val_dtypes: dict[str, np.dtype] | None = None,
) -> "ray.data.Dataset":
    val_dtypes = val_dtypes or {c: np.dtype("float64") for c in right_vals}
    out_cols = [left_id, "asof_ts", right_id, *right_vals]
    sorted_ds = tagged.sort([key_col, ts_col, "_side", "_tie"])

    def block_fn(b: pd.DataFrame) -> pd.DataFrame:
        n = len(b)
        empty = {
            left_id: pd.Series([], dtype="int64"),
            "asof_ts": pd.Series([], dtype="datetime64[us]"),
            right_id: pd.Series([], dtype="int64"),
            **{c: pd.Series([], dtype=val_dtypes[c]) for c in right_vals},
            "kind": pd.Series([], dtype=object),
            key_col: pd.Series([], dtype=b[key_col].dtype if n else "int64"),
            "_tie": pd.Series([], dtype="int64"),
        }
        if n == 0:
            return pd.DataFrame(empty)
        matched, ffill, run_id = _resolve_sorted(b, key_col)
        side = b["_side"].to_numpy()
        is_left = side == _SIDE_LEFT
        done_mask = is_left & matched
        src = ffill[done_mask]
        done = pd.DataFrame(
            {
                left_id: b[left_id].to_numpy()[done_mask],
                "asof_ts": b[ts_col].to_numpy()[src],
                right_id: b[right_id].to_numpy()[src],
                **{c: b[c].to_numpy()[src] for c in right_vals},
                "kind": "done",
                key_col: b[key_col].to_numpy()[done_mask],
                "_tie": np.int64(0),
            }
        )
        frames = [done]
        # unresolved heads of the FIRST run: predecessor may be in an
        # earlier block — forward the raw left row (ts rides in asof_ts)
        head = is_left & ~matched & (run_id == 0)
        if head.any():
            frames.append(
                pd.DataFrame(
                    {
                        left_id: b[left_id].to_numpy()[head],
                        "asof_ts": b[ts_col].to_numpy()[head],
                        right_id: np.int64(0),
                        **{c: _zeros_of(val_dtypes[c], int(head.sum()))
                           for c in right_vals},
                        "kind": "head",
                        key_col: b[key_col].to_numpy()[head],
                        "_tie": np.int64(0),
                    }
                )
            )
        # carry: the last right row of the LAST run (<= 1 row per block).
        # Later keys never look back past their own run start, so only
        # the run that can continue into the next block matters.
        last_run = run_id[-1]
        carry = np.flatnonzero((run_id == last_run) & (side == _SIDE_RIGHT))
        if len(carry):
            i = carry[-1]
            frames.append(
                pd.DataFrame(
                    {
                        left_id: np.int64(0),
                        "asof_ts": [b[ts_col].to_numpy()[i]],
                        right_id: b[right_id].to_numpy()[i],
                        **{c: b[c].to_numpy()[i] for c in right_vals},
                        "kind": "carry",
                        key_col: b[key_col].to_numpy()[i],
                        "_tie": b["_tie"].to_numpy()[i],
                    }
                )
            )
        out = pd.concat(frames, ignore_index=True)
        # the 1-row carry frame is built from python lists, which pandas
        # infers as datetime64[ns]; blocks without a carry stay [us]
        # (Arrow unit) — normalize so every block carries ONE schema
        out["asof_ts"] = out["asof_ts"].astype("datetime64[us]")
        return out

    from . import drop_empty_blocks

    # sort can hand block_fn empty range partitions; their typed-empty
    # outputs would make the done/edges filter maps emit schema-less
    # blocks (skipped-UDF family) — rebuild the block list (free: the
    # dataset is already materialized, refs are reused)
    tagged2 = drop_empty_blocks(
        sorted_ds.map_batches(block_fn, batch_format="pandas").materialize()
    )
    done = tagged2.map_batches(
        lambda b: b[b["kind"] == "done"][out_cols], batch_format="pandas"
    )

    def merge_edges(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return b[out_cols]
        side = np.where(b["kind"].to_numpy() == "carry", _SIDE_RIGHT, _SIDE_LEFT)
        m = pd.DataFrame(
            {
                key_col: b[key_col].to_numpy(),
                ts_col: b["asof_ts"].to_numpy(),
                "_side": side,
                "_tie": b["_tie"].to_numpy(),
                left_id: b[left_id].to_numpy(),
                right_id: b[right_id].to_numpy(),
                **{c: b[c].to_numpy() for c in right_vals},
            }
        ).sort_values([key_col, ts_col, "_side", "_tie"], kind="mergesort")
        m = m.reset_index(drop=True)
        matched, ffill, _ = _resolve_sorted(m, key_col)
        is_left = m["_side"].to_numpy() == _SIDE_LEFT
        sel = is_left & matched
        src = ffill[sel]
        out = pd.DataFrame(
            {
                left_id: m[left_id].to_numpy()[sel],
                "asof_ts": m[ts_col].to_numpy()[src],
                right_id: m[right_id].to_numpy()[src],
                **{c: m[c].to_numpy()[src] for c in right_vals},
            }
        )
        out["asof_ts"] = out["asof_ts"].astype("datetime64[us]")
        return out

    edges = (
        tagged2.map_batches(
            lambda b: b[b["kind"] != "done"], batch_format="pandas"
        )
        .repartition(1)
        .map_batches(merge_edges, batch_format="pandas")
    )
    return done.union(edges)


def range_join(
    points: "ray.data.Dataset",
    intervals: "ray.data.Dataset",
    key_col: str,
    point_ts: str = "ts",
    point_id: str = "event_id",
    ivl_start: str = "ts",
    ivl_id: str = "ivl_id",
    width_us: int = 24 * 3600 * 1_000_000,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Inner point-in-interval join: pairs (point_id, ivl_id) where the
    two rows share key_col and ivl_start <= point.ts < ivl_start +
    width_us (half-open, microseconds). Intervals are replicated into
    the <= 2 buckets of width width_us they touch; points hash into one
    bucket; Dataset.join on (key, bucket) then an exact filter."""

    def point_rows(b: pd.DataFrame) -> pd.DataFrame:
        us = b[point_ts].astype("datetime64[us]").astype("int64").to_numpy()
        return pd.DataFrame(
            {
                key_col: b[key_col].to_numpy(),
                "_bucket": us // width_us,
                "_p_us": us,
                point_id: b[point_id].to_numpy(),
            }
        )

    def ivl_rows(b: pd.DataFrame) -> pd.DataFrame:
        us = b[ivl_start].astype("datetime64[us]").astype("int64").to_numpy()
        b0 = us // width_us
        # half-open end: last covered microsecond is us + width_us - 1
        b1 = (us + width_us - 1) // width_us
        key = b[key_col].to_numpy()
        ids = b[ivl_id].to_numpy()
        out = pd.DataFrame(
            {
                key_col: np.concatenate([key, key]),
                "_bucket": np.concatenate([b0, b1]),
                "_i_us": np.concatenate([us, us]),
                ivl_id: np.concatenate([ids, ids]),
            }
        )
        dup_second = np.concatenate([np.zeros(len(b), bool), b0 == b1])
        return out[~dup_second]

    if num_partitions is None:
        # size the join shuffle to the cluster: too few partitions
        # serializes the probe-side hash tables (8 partitions took >10
        # min on a 20M-row self-join that 32 finished in 38 s), while
        # partitions > CPUs starve the streaming executor under small
        # sessions (the fixed-pool deadlock, NOTES_ROUND1).
        from . import default_join_partitions

        num_partitions = default_join_partitions()

    p = points.map_batches(point_rows, batch_format="pandas")
    i = intervals.map_batches(ivl_rows, batch_format="pandas")
    joined = p.join(
        i, "inner", num_partitions=num_partitions, on=(key_col, "_bucket"),
        right_on=(key_col, "_bucket"),
    )

    def exact(b: pd.DataFrame) -> pd.DataFrame:
        ok = (b["_i_us"] <= b["_p_us"]) & (b["_p_us"] < b["_i_us"] + width_us)
        return b[ok][[point_id, ivl_id]]

    return joined.map_batches(exact, batch_format="pandas")
