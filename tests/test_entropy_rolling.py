"""char_entropy_batch and rolling_window_distinct vs plain-Python
references, including unicode text and window/block boundary cases."""

import collections
import math

import numpy as np
import pandas as pd
import ray.data

from matomo_log_analytics_ray.ops import textstats, window


def _entropy_ref(s: str) -> float:
    if not s:
        return 0.0
    c = collections.Counter(s)
    n = len(s)
    return -sum((v / n) * math.log2(v / n) for v in c.values())


def test_char_entropy_matches_reference():
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3, 4],
            "text": ["aaaa", "abab", "abcd", "", "héllo wörld"],
        }
    )
    got = textstats.char_entropy_batch(docs)
    for _, r in got.iterrows():
        want = _entropy_ref(docs.loc[docs.doc_id == r["doc_id"], "text"].iloc[0])
        assert abs(r["char_entropy"] - round(want, 6)) < 1e-9


def test_char_entropy_batch_boundaries():
    rng = np.random.default_rng(8)
    texts = [
        "".join(rng.choice(list("abcdef "), size=int(rng.integers(0, 60))))
        for _ in range(200)
    ]
    df = pd.DataFrame({"doc_id": range(200), "text": texts})
    ds = ray.data.from_pandas(df).repartition(5)
    got = (
        ds.map_batches(textstats.char_entropy_batch, batch_format="pandas")
        .to_pandas()
        .sort_values("doc_id")
    )
    for did, ent in zip(got["doc_id"], got["char_entropy"]):
        assert abs(ent - round(_entropy_ref(texts[did]), 6)) < 1e-9


def _rolling_ref(df, w=7):
    p = df.assign(d=df["ts"].dt.floor("D"))[["user_id", "d"]].drop_duplicates()
    days = pd.date_range(p["d"].min(), p["d"].max(), freq="D")
    out = []
    for day in days:
        m = (p["d"] > day - pd.Timedelta(days=w)) & (p["d"] <= day)
        out.append((day.strftime("%Y-%m-%d"), p.loc[m, "user_id"].nunique()))
    return pd.DataFrame(out, columns=["day", "active"])


def test_rolling_window_distinct_matches_reference():
    rng = np.random.default_rng(17)
    n = 800
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, 25, size=n),
            "ts": pd.Timestamp("2024-02-01")
            + pd.to_timedelta(rng.integers(0, 20 * 86400, size=n), unit="s"),
        }
    )
    want = _rolling_ref(df)
    # the operator only reports days with >= 1 active user in-window;
    # with 25 users over 20 days every day qualifies here
    for nblocks in (1, 4):
        ds = ray.data.from_pandas(df).repartition(nblocks)
        got = (
            window.rolling_window_distinct(ds, "user_id", "ts", 7)
            .to_pandas()
            .sort_values("day")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
