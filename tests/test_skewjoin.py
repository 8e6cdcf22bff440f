"""ops/skewjoin: salted inner join equals a pandas merge — hot-key,
uniform (plain-join fallback), null-key, duplicate-right-key, and
disjoint-key inputs, on any partitioning and any k_salts."""

import numpy as np
import pandas as pd
import ray.data

from matomo_log_analytics_ray.ops.skewjoin import skew_join


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    return (
        df[cols]
        .sort_values(cols, kind="mergesort")
        .reset_index(drop=True)
    )


def _run(left, right, **kw) -> pd.DataFrame:
    out = skew_join(
        ray.data.from_pandas(left).repartition(kw.pop("l_parts", 4)),
        ray.data.from_pandas(right).repartition(kw.pop("r_parts", 3)),
        **kw,
    ).to_pandas()
    return _sorted(out)


def _skewed_inputs(seed=7, n=5_000, hot_frac=0.5):
    rng = np.random.default_rng(seed)
    keys = rng.integers(0, 200, size=n)
    keys[: int(n * hot_frac)] = 42  # one key holds half the rows
    left = pd.DataFrame(
        {"k": keys, "lv": rng.normal(size=n).round(3)}
    )
    right = pd.DataFrame(
        {"k": np.arange(0, 200), "rv": np.arange(0, 200) * 10}
    )
    return left, right


def test_hot_key_matches_pandas_merge():
    left, right = _skewed_inputs()
    want = _sorted(left.merge(right, on="k"))
    for k_salts in (1, 4, 16):
        got = _run(left, right, on="k", k_salts=k_salts, phi=0.05)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_uniform_falls_back_to_plain_join():
    rng = np.random.default_rng(11)
    left = pd.DataFrame(
        {"k": rng.integers(0, 2_000, size=4_000), "lv": rng.integers(0, 9, 4_000)}
    )
    right = pd.DataFrame({"k": np.arange(2_000), "rv": np.arange(2_000)})
    # phi high enough that no key qualifies -> fallback path
    got = _run(left, right, on="k", phi=0.2)
    want = _sorted(left.merge(right, on="k"))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_null_keys_never_match():
    left = pd.DataFrame(
        {"k": pd.array([1, None, 2, 1, None, 1, 1, 1], dtype="Int64"),
         "lv": range(8)}
    )
    right = pd.DataFrame(
        {"k": pd.array([1, 2, None], dtype="Int64"), "rv": [10, 20, 30]}
    )
    got = _run(left, right, on="k", phi=0.3, k_salts=2, l_parts=2, r_parts=2)
    want = _sorted(
        left.dropna(subset=["k"]).merge(right.dropna(subset=["k"]), on="k")
    )
    pd.testing.assert_frame_equal(
        got.astype({"k": "int64"}), want.astype({"k": "int64"}),
        check_dtype=False,
    )


def test_duplicate_right_keys_multiply():
    # right side has 3 rows per key, including for the hot key: every
    # replicated copy must keep exactly one salt's worth of matches
    rng = np.random.default_rng(3)
    keys = np.where(rng.random(3_000) < 0.6, 7, rng.integers(0, 50, 3_000))
    left = pd.DataFrame({"k": keys, "lv": np.arange(3_000)})
    right = pd.DataFrame(
        {"k": np.repeat(np.arange(50), 3), "rv": np.arange(150)}
    )
    got = _run(left, right, on="k", phi=0.1, k_salts=8)
    want = _sorted(left.merge(right, on="k"))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_differing_key_names_and_disjoint_keys():
    left = pd.DataFrame({"a": [1, 1, 1, 1, 2, 99], "lv": range(6)})
    right = pd.DataFrame({"b": [1, 2, 3], "rv": [10, 20, 30]})
    got = _run(
        left, right, on="a", right_on="b", phi=0.3, k_salts=3,
        l_parts=2, r_parts=1,
    )
    # Dataset.join keeps only the LEFT key column when names differ
    want = _sorted(
        left.merge(right, left_on="a", right_on="b").drop(columns=["b"])
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_string_keys():
    rng = np.random.default_rng(5)
    pool = np.array([f"u{i}" for i in range(30)], dtype=object)
    keys = pool[rng.integers(0, 30, size=2_000)]
    keys[:1_000] = "hot"
    left = pd.DataFrame({"k": keys, "lv": np.arange(2_000)})
    right = pd.DataFrame(
        {"k": np.append(pool, "hot"), "rv": np.arange(31)}
    )
    got = _run(left, right, on="k", phi=0.05, k_salts=4)
    want = _sorted(left.merge(right, on="k"))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
