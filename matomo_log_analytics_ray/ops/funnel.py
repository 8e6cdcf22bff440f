"""Event-funnel, cohort-retention and debounce operators.

Classic log-analytics shapes over the ``events`` stream (the same
family as the reference's per-date status rollups in
``reference/libs/lib_status.py`` — counts over a user/date lattice —
re-expressed as distributed Ray Data pipelines):

* ``funnel_counts`` — ordered conversion funnel ("first B strictly
  after the user's first A"): K staged semi-joins, each stage a
  hash-join of an id/timestamp projection against the previous
  stage's conversion table, then a sorted-run MIN.  No stage ever
  shuffles raw event rows — only (user_id, ts) pairs of the one
  event type it filters to.
* ``cohort_retention`` — first-seen-day cohorts x day offset
  retention counts.  Distinct (user, day) pairs via sorted-run
  counting, per-user first day via sorted-run MIN, one hash join,
  then a low-cardinality partial-count aggregate.
* ``debounce`` — drop events that repeat within ``gap_us`` of the
  previous event of the same (user, type): SQL
  ``LAG(ts) OVER (PARTITION BY user, type ORDER BY ts, id)`` via the
  ops/window two-pass sorted machinery, then a vectorized filter.

Scale notes: every shuffle here moves fixed-width projections
(int64 ids + int64/float64 timestamps), never payload columns; hot
users collapse to pre-reduced edge rows inside the sorted-run
kernels; the joins are sized by ``default_join_partitions()``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data

from . import default_join_partitions
from .dedup import sorted_group_counts, sorted_group_first


def _first_ts_per_user(
    ds: "ray.data.Dataset", user_col: str, ts_col: str
) -> "ray.data.Dataset":
    """MIN(ts) per user via sorted runs; output (user_col, ts_col).
    An in-batch min pre-reduction runs BEFORE the sort (min of mins
    is exact), so the shuffle moves at most (users-per-block x
    blocks) rows instead of every event of the step type."""
    pre = ds.map_batches(
        lambda b: b.groupby(user_col, as_index=False)[ts_col].min(),
        batch_format="pandas",
    )
    return sorted_group_first(pre, [user_col], ts_col)


def funnel_counts(
    events: "ray.data.Dataset",
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    within_us: int | None = None,
) -> pd.DataFrame:
    """Ordered-funnel conversion counts.

    A user reaches step k if they have an event of type ``steps[k]``
    STRICTLY AFTER their step-(k-1) conversion time (chained
    first-match semantics, the standard product-analytics funnel) —
    and, when ``within_us`` is given, no more than that many
    microseconds after it (the windowed funnel every product
    analytics tool ships).  Returns a small DataFrame
    (step, step_idx, users) — K rows; the driver only ever holds K
    integers, never row-scale data.
    """
    np_join = default_join_partitions()
    conv = None  # Dataset (user_col, ts_col): conversion time at step k
    out_rows = []
    for k, step in enumerate(steps):
        proj = events.filter(
            expr=f"{type_col} == {step!r}"
        ).select_columns([user_col, ts_col]).materialize()
        if proj.count() == 0:
            # no events of this type at all: this and every later step
            # converts nobody — and a fully-empty join side would feed
            # pyarrow schema-less blocks (the NOTES landmine)
            for k2 in range(k, len(steps)):
                out_rows.append((steps[k2], k2 + 1, 0))
            break
        if conv is None:
            conv = _first_ts_per_user(proj, user_col, ts_col)
        else:
            prev = conv.map_batches(
                lambda b: b.rename(columns={ts_col: "_prev_ts"}),
                batch_format="pandas",
            # sorted_group_first descends from sort+union: rebuild the
            # block list so no schema-less empty block reaches the join
            ).repartition(np_join)
            cand = proj.repartition(np_join).join(
                prev, "inner", num_partitions=np_join, on=(user_col,)
            )
            def in_window(b: pd.DataFrame) -> pd.DataFrame:
                cur = b[ts_col].to_numpy(dtype="datetime64[us]")
                prev = b["_prev_ts"].to_numpy(dtype="datetime64[us]")
                m = cur > prev
                if within_us is not None:
                    m &= (cur - prev) <= np.timedelta64(within_us, "us")
                return b.loc[m, [user_col, ts_col]]

            after = cand.map_batches(in_window, batch_format="pandas")
            conv = _first_ts_per_user(after, user_col, ts_col)
        # conv is user-count-sized; pin it so stage k+1 (and the count
        # below) don't re-execute the whole upstream lineage
        conv = conv.materialize()
        n = int(conv.count())
        out_rows.append((step, k + 1, n))
        if n == 0:  # nobody converted: remaining steps are all zero
            for k2 in range(k + 1, len(steps)):
                out_rows.append((steps[k2], k2 + 1, 0))
            break
    return pd.DataFrame(out_rows, columns=["step", "step_idx", "users"])


def cohort_retention(
    events: "ray.data.Dataset",
    user_col: str = "user_id",
    ts_col: str = "ts",
    max_offset: int = 30,
) -> "ray.data.Dataset":
    """Retention triangle: users active ``day_offset`` days after their
    first-seen day, grouped by that cohort day.

    Output (cohort_day: 'YYYY-MM-DD' string, day_offset: int64,
    users: int64).  Row count is O(days x max_offset), never
    row-scale.  Counting rows of the distinct (user, day) pairs IS
    the distinct-user count per cell because each user contributes
    each day at most once.
    """
    np_join = default_join_partitions()

    def to_day(b: pd.DataFrame) -> pd.DataFrame:
        # integer day index keeps the shuffled projection fixed-width
        # (int64) instead of a string column
        day = (
            b[ts_col].to_numpy(dtype="datetime64[us]").astype("datetime64[D]")
        )
        return pd.DataFrame(
            {
                user_col: b[user_col].to_numpy(),
                "_day": day.astype("int64"),
            }
        ).drop_duplicates()  # in-batch pre-reduce before the shuffle

    pairs = (
        events.select_columns([user_col, ts_col])
        .map_batches(to_day, batch_format="pandas")
    )
    # global distinct (user, day): sorted-run counting, counts dropped.
    # Materialized: BOTH the first-day pass and the join consume it
    # (one execution, not two), and the count() short-circuits the
    # empty input before a schema-less block can reach the join.
    dpairs = (
        sorted_group_counts(pairs, [user_col, "_day"])
        .drop_columns(["n"])
        .materialize()
    )
    if dpairs.count() == 0:
        import ray.data as rd

        return rd.from_pandas(
            pd.DataFrame(
                {
                    "cohort_day": pd.Series([], dtype=object),
                    "day_offset": pd.Series([], dtype="int64"),
                    "users": pd.Series([], dtype="int64"),
                }
            )
        )
    first = sorted_group_first(
        dpairs, [user_col], "_day"
    ).map_batches(
        lambda b: b.rename(columns={"_day": "_cohort"}), batch_format="pandas"
    )
    j = (
        dpairs.repartition(np_join)
        .join(
            first.repartition(np_join),
            "inner",
            num_partitions=np_join,
            on=(user_col,),
        )
    )

    def cell_partials(b: pd.DataFrame) -> pd.DataFrame:
        off = b["_day"].to_numpy() - b["_cohort"].to_numpy()
        keep = off <= max_offset
        g = (
            pd.DataFrame({"_cohort": b["_cohort"].to_numpy()[keep], "off": off[keep]})
            .groupby(["_cohort", "off"], as_index=False)
            .size()
        )
        return g.rename(columns={"size": "users"})

    from ray.data.aggregate import Sum

    partials = j.map_batches(cell_partials, batch_format="pandas")
    agg = partials.groupby(["_cohort", "off"]).aggregate(
        Sum("users", alias_name="users")
    )

    def finalize(b: pd.DataFrame) -> pd.DataFrame:
        day = b["_cohort"].to_numpy(dtype="int64").astype("datetime64[D]")
        return pd.DataFrame(
            {
                "cohort_day": np.datetime_as_string(day, unit="D"),
                "day_offset": b["off"].to_numpy(dtype="int64"),
                "users": b["users"].to_numpy(dtype="int64"),
            }
        )

    return agg.map_batches(finalize, batch_format="pandas")


def debounce(
    events: "ray.data.Dataset",
    gap_us: int,
    key_cols: list[str] | None = None,
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> "ray.data.Dataset":
    """Keep an event only if >= ``gap_us`` microseconds passed since the
    PREVIOUS event of the same key (LAG semantics — each row compares
    to its raw predecessor, the SQL-expressible debounce).  First
    event per key is always kept.

    Output: (id_col, *key_cols, ts_col) of kept events.  Microsecond
    epochs stay exact in float64 (< 2^53 until year 2255).
    """
    from .window import grouped_lag

    keys = key_cols if key_cols is not None else ["user_id", "event_type"]

    def add_epoch(b: pd.DataFrame) -> pd.DataFrame:
        out = b[[id_col, *keys, ts_col]].copy()
        out["_ts_us"] = (
            b[ts_col].to_numpy(dtype="datetime64[us]").astype("int64")
        )
        return out

    proj = events.select_columns([id_col, *keys, ts_col]).map_batches(
        add_epoch, batch_format="pandas"
    )
    lagged = grouped_lag(
        proj, keys, ["_ts_us", id_col], "_ts_us", n=1, out_col="_prev_us"
    )

    def keep(b: pd.DataFrame) -> pd.DataFrame:
        prev = b["_prev_us"].to_numpy(dtype="float64")
        cur = b["_ts_us"].to_numpy(dtype="int64").astype("float64")
        m = np.isnan(prev) | (cur - prev >= float(gap_us))
        return b.loc[m, [id_col, *keys, ts_col]]

    return lagged.map_batches(keep, batch_format="pandas")
