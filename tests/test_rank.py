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
