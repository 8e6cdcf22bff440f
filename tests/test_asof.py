"""ops/asof: distributed as-of join and range join equal a pandas
reference regardless of block boundaries (heads resolved via the merge
pass, carries pre-reduced to one row per block)."""

import numpy as np
import pandas as pd
import ray.data

from matomo_log_analytics_ray.ops import asof


def _make_sides(n_left=300, n_right=120, n_keys=9, seed=11):
    rng = np.random.default_rng(seed)
    base = pd.Timestamp("2024-01-01")

    def mk(n, id0):
        return pd.DataFrame(
            {
                "user_id": rng.integers(0, n_keys, size=n),
                "ts": base + pd.to_timedelta(rng.integers(0, 10**6, size=n), unit="s"),
                "event_id": np.arange(id0, id0 + n, dtype=np.int64),
            }
        )

    return mk(n_left, 0), mk(n_right, 10_000)


def _asof_reference(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for _, l in left.iterrows():
        cand = right[(right["user_id"] == l["user_id"]) & (right["ts"] <= l["ts"])]
        if len(cand) == 0:
            continue
        top = cand[cand["ts"] == cand["ts"].max()]
        rows.append(
            (l["event_id"], top["ts"].iloc[0], top["event_id"].max())
        )
    return pd.DataFrame(rows, columns=["event_id", "asof_ts", "asof_event_id"])


def _canon(df):
    return (
        df.sort_values(list(df.columns))
        .reset_index(drop=True)
        .astype({c: "int64" for c in df.columns if df[c].dtype.kind == "i"})
    )


def test_asof_matches_reference_across_block_boundaries():
    left, right = _make_sides()
    rr = right.rename(columns={"event_id": "asof_event_id"})
    want = _canon(_asof_reference(left, right))
    for nblocks in (1, 4, 16):
        lds = ray.data.from_pandas(left).repartition(nblocks)
        rds = ray.data.from_pandas(rr).repartition(nblocks)
        got = asof.asof_join(
            lds, rds, key_col="user_id", ts_col="ts",
            left_id="event_id", right_id="asof_event_id",
        ).to_pandas()
        pd.testing.assert_frame_equal(_canon(got), want, check_dtype=False)


def test_asof_ties_break_to_max_tie_col():
    # two right rows at the identical ts: the greater asof_event_id wins;
    # a right row at exactly left.ts matches (<= semantics)
    base = pd.Timestamp("2024-01-01")
    left = pd.DataFrame(
        {"user_id": [1, 1], "ts": [base, base + pd.Timedelta(seconds=5)],
         "event_id": np.array([1, 2], dtype=np.int64)}
    )
    right = pd.DataFrame(
        {"user_id": [1, 1, 1], "ts": [base, base, base + pd.Timedelta(seconds=9)],
         "asof_event_id": np.array([50, 51, 52], dtype=np.int64)}
    )
    got = asof.asof_join(
        ray.data.from_pandas(left), ray.data.from_pandas(right),
        key_col="user_id", ts_col="ts",
        left_id="event_id", right_id="asof_event_id",
    ).to_pandas().sort_values("event_id").reset_index(drop=True)
    assert got["asof_event_id"].tolist() == [51, 51]


def test_asof_single_hot_key_spans_blocks():
    # one key across every block: heads + carries flow through the merge
    base = pd.Timestamp("2024-01-01")
    left = pd.DataFrame(
        {"user_id": np.zeros(200, dtype=np.int64),
         "ts": base + pd.to_timedelta(np.arange(200) * 7, unit="s"),
         "event_id": np.arange(200, dtype=np.int64)}
    )
    right = pd.DataFrame(
        {"user_id": np.zeros(40, dtype=np.int64),
         "ts": base + pd.to_timedelta(np.arange(40) * 31 + 3, unit="s"),
         "asof_event_id": np.arange(1000, 1040, dtype=np.int64)}
    )
    want = _canon(
        _asof_reference(left, right.rename(columns={"asof_event_id": "event_id"}))
    )
    got = asof.asof_join(
        ray.data.from_pandas(left).repartition(8),
        ray.data.from_pandas(right).repartition(8),
        key_col="user_id", ts_col="ts",
        left_id="event_id", right_id="asof_event_id",
    ).to_pandas()
    pd.testing.assert_frame_equal(_canon(got), want, check_dtype=False)


def test_range_join_matches_reference():
    left, right = _make_sides(n_left=250, n_right=80, seed=23)
    width_us = 3600 * 1_000_000
    merged = left.merge(
        right, on="user_id", suffixes=("_p", "_i")
    )
    us_p = merged["ts_p"].astype("datetime64[us]").astype("int64")
    us_i = merged["ts_i"].astype("datetime64[us]").astype("int64")
    keep = (us_i <= us_p) & (us_p < us_i + width_us)
    want = (
        merged[keep][["event_id_p", "event_id_i"]]
        .rename(columns={"event_id_p": "click_id", "event_id_i": "purchase_id"})
    )
    got = asof.range_join(
        ray.data.from_pandas(left.rename(columns={"event_id": "click_id"})).repartition(5),
        ray.data.from_pandas(right.rename(columns={"event_id": "purchase_id"})).repartition(5),
        key_col="user_id", point_ts="ts", point_id="click_id",
        ivl_start="ts", ivl_id="purchase_id", width_us=width_us,
    ).to_pandas()
    pd.testing.assert_frame_equal(_canon(got), _canon(want), check_dtype=False)
    # boundary semantics: interval is half-open — a point exactly at
    # start matches, a point exactly at start+width does not
    base = pd.Timestamp("2024-01-01")
    pts = pd.DataFrame(
        {"user_id": [1, 1], "ts": [base, base + pd.Timedelta(hours=1)],
         "click_id": np.array([1, 2], dtype=np.int64)}
    )
    ivl = pd.DataFrame(
        {"user_id": [1], "ts": [base], "purchase_id": np.array([9], dtype=np.int64)}
    )
    got2 = asof.range_join(
        ray.data.from_pandas(pts), ray.data.from_pandas(ivl),
        key_col="user_id", point_ts="ts", point_id="click_id",
        ivl_start="ts", ivl_id="purchase_id", width_us=width_us,
    ).to_pandas()
    assert got2["click_id"].tolist() == [1]


def test_grouped_topk_matches_reference():
    from matomo_log_analytics_ray.ops import topk

    rng = np.random.default_rng(5)
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, 11, size=500),
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 10**5, size=500), unit="s"),
            "event_id": np.arange(500, dtype=np.int64),
        }
    )
    want = (
        df.sort_values(["user_id", "ts", "event_id"], ascending=[True, False, False])
        .groupby("user_id", sort=False)
        .head(3)
    )
    for nblocks in (1, 4, 16):
        got = topk.grouped_topk(
            ray.data.from_pandas(df).repartition(nblocks),
            key_cols=["user_id"], sort_cols=["ts", "event_id"], k=3,
        ).to_pandas()
        pd.testing.assert_frame_equal(_canon(got), _canon(want), check_dtype=False)


def test_grouped_topk_single_hot_key():
    from matomo_log_analytics_ray.ops import topk

    df = pd.DataFrame(
        {
            "user_id": np.zeros(400, dtype=np.int64),
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(np.arange(400), unit="s"),
            "event_id": np.arange(400, dtype=np.int64),
        }
    )
    got = topk.grouped_topk(
        ray.data.from_pandas(df).repartition(8),
        key_cols=["user_id"], sort_cols=["ts", "event_id"], k=5,
    ).to_pandas()
    assert sorted(got["event_id"].tolist()) == [395, 396, 397, 398, 399]


def test_asof_join_self_equals_two_sided():
    # single-scan tagged union must produce exactly the two-dataset result
    left, right = _make_sides(seed=31)
    both = pd.concat(
        [left.assign(kind="L"), right.assign(kind="R")], ignore_index=True
    )
    two = asof.asof_join(
        ray.data.from_pandas(left).repartition(4),
        ray.data.from_pandas(right.rename(columns={"event_id": "asof_event_id"})).repartition(4),
        key_col="user_id", ts_col="ts",
        left_id="event_id", right_id="asof_event_id",
    ).to_pandas()
    one = asof.asof_join_self(
        ray.data.from_pandas(both).repartition(4),
        key_col="user_id", ts_col="ts",
        left_mask=lambda b: b["kind"] == "L",
        right_mask=lambda b: b["kind"] == "R",
    ).to_pandas()
    pd.testing.assert_frame_equal(_canon(one), _canon(two), check_dtype=False)


def test_asof_integer_right_vals_schema_consistent():
    # ADVICE r2: left-branch fillers must take the right side's dtype —
    # int64 right_vals used to get float 0.0 fillers and union
    # schema-mismatched blocks
    left, right = _make_sides()
    rr = right.rename(columns={"event_id": "asof_event_id"})
    rr["qty"] = np.arange(len(rr), dtype=np.int64)
    got = asof.asof_join(
        ray.data.from_pandas(left).repartition(4),
        ray.data.from_pandas(rr).repartition(4),
        key_col="user_id", ts_col="ts",
        left_id="event_id", right_id="asof_event_id",
        right_vals=["qty"],
    ).to_pandas()
    assert got["qty"].dtype.kind == "i"
    # values must be the matched right row's qty
    m = rr.set_index("asof_event_id")["qty"]
    assert (got["qty"].to_numpy() == m.loc[got["asof_event_id"]].to_numpy()).all()
