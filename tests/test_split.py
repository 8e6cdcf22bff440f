"""ops/split: deterministic hash split and stratified sampling are
stable across partitioning, leakage-safe (same id -> same split), and
match their declared fractions."""

import numpy as np
import pandas as pd
import ray.data

from matomo_log_analytics_ray.ops import split


def test_hash_split_deterministic_and_partition_invariant():
    df = pd.DataFrame({"doc_id": np.arange(5000, dtype=np.int64)})
    outs = []
    for nblocks in (1, 7):
        ds = ray.data.from_pandas(df).repartition(nblocks)
        out = (
            split.hash_split(ds, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    frac = outs[0]["split"].value_counts(normalize=True)
    assert abs(frac["train"] - 0.8) < 0.03
    assert abs(frac["val"] - 0.1) < 0.03
    assert abs(frac["test"] - 0.1) < 0.03


def test_hash_split_fraction_validation():
    ds = ray.data.from_pandas(pd.DataFrame({"doc_id": [1]}))
    try:
        split.hash_split(ds, "doc_id", {"train": 0.5, "val": 0.1})
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_knuth_bucket_matches_sql_formula():
    ids = np.array([0, 1, 17, 999_983, 2**31 - 1], dtype=np.int64)
    got = split.knuth_bucket(ids, 1000)
    want = [(int(i) * 2654435761) % 2**32 % 1000 for i in ids]
    assert got.tolist() == want


def test_stratified_sample_exact_k_and_stable():
    rng = np.random.default_rng(9)
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b", "c"], size=3000),
            "event_id": np.arange(3000, dtype=np.int64),
        }
    )
    outs = []
    for nblocks in (1, 8):
        ds = ray.data.from_pandas(df).repartition(nblocks)
        out = (
            split.stratified_sample(ds, "g", "event_id", k=7)
            .to_pandas()
            .sort_values(["g", "event_id"])
            .reset_index(drop=True)
        )
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    assert outs[0].groupby("g").size().tolist() == [7, 7, 7]


def test_rate_sample_deterministic_and_monotone():
    """Rate sampling is partition-invariant, respects per-group rates,
    and raising a rate only ADDS rows (bucket-threshold monotonicity)."""
    rng = np.random.default_rng(4)
    df = pd.DataFrame(
        {
            "doc_id": np.arange(8000, dtype=np.int64),
            "source": rng.choice(["a", "b", "zz"], size=8000),
        }
    )
    rates = {"a": 1.0, "b": 0.25}
    outs = []
    for nblocks in (1, 9):
        ds = ray.data.from_pandas(df).repartition(nblocks)
        out = (
            split.rate_sample(ds, "doc_id", "source", rates, default_rate=0.5)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    got = outs[0]
    n = df.groupby("source").size()
    kept = got.groupby("source").size()
    assert kept["a"] == n["a"]  # rate 1.0 keeps everything
    assert abs(kept["b"] / n["b"] - 0.25) < 0.05
    assert abs(kept["zz"] / n["zz"] - 0.5) < 0.05  # default rate
    # monotone: the 0.25 sample is a subset of the 0.60 sample
    bigger = (
        split.rate_sample(
            ray.data.from_pandas(df), "doc_id", "source", {"a": 1.0, "b": 0.6}, 0.5
        )
        .to_pandas()
    )
    small_b = set(got[got.source == "b"].doc_id)
    big_b = set(bigger[bigger.source == "b"].doc_id)
    assert small_b <= big_b


def test_weighted_sample_proportional_and_deterministic():
    """A-Res: selection probability tracks weight; output is a pure
    function of the table (partition-invariant)."""
    import numpy as np
    import pandas as pd
    import ray.data

    from matomo_log_analytics_ray.ops import split

    n = 20_000
    df = pd.DataFrame(
        {
            "id": np.arange(n, dtype=np.int64),
            # two weight classes, 10x apart; some zero-weight rows
            "w": np.where(np.arange(n) % 2 == 0, 10.0, 1.0),
        }
    )
    df.loc[df.index[:100], "w"] = 0.0
    outs = []
    for parts in (2, 9):
        ds = ray.data.from_pandas(df).repartition(parts)
        out = (
            split.weighted_sample(ds, "id", "w", k=2000)
            .to_pandas()
            .sort_values("id")
            .reset_index(drop=True)
        )
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    out = outs[0]
    assert len(out) == 2000
    assert (df.set_index("id").loc[out["id"], "w"] > 0).all()
    heavy = (out["id"] % 2 == 0).sum()
    # E[heavy] ~ 10/11 * 2000 = 1818; loose 5-sigma-ish band
    assert 1700 < heavy < 1930
