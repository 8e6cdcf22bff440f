"""ops/validate: every rule kind counts exactly the planted
violations, across block layouts."""

import numpy as np
import pandas as pd
import ray.data

from matomo_log_analytics_ray.ops import validate as v


def _make():
    df = pd.DataFrame(
        {
            "k": [1, 2, 2, 3, 4, 4, 4, 99],
            "x": [0.5, None, 1.5, 0.2, -0.1, 0.9, 0.7, 0.3],
            "f": ["a", "b", "a", "z", "a", "b", "q", "a"],
        }
    )
    ref = pd.DataFrame({"rk": [1, 2, 3, 4]})
    return df, ref


def test_validate_all_rules():
    df, ref = _make()
    for nblocks in (1, 4):
        ds = ray.data.from_pandas(df).repartition(nblocks)
        refds = ray.data.from_pandas(ref)
        out = v.validate(
            ds,
            [
                {"rule": "not_null", "col": "x"},
                {"rule": "range", "col": "x", "lo": 0.0, "hi": 1.0},
                {"rule": "in_set", "col": "f", "values": ["a", "b"]},
                {"rule": "unique", "col": "k"},
                {"rule": "fk_exists", "col": "k", "ref": refds, "ref_col": "rk"},
            ],
        ).set_index("rule")
        assert out.loc["not_null(x)", "violations"] == 1
        # out-of-range: 1.5 and -0.1 (the null is not counted here)
        assert out.loc["range(x)", "violations"] == 2
        assert out.loc["in_set(f)", "violations"] == 2  # z, q
        # dups: one extra 2, two extra 4s
        assert out.loc["unique(k)", "violations"] == 3
        assert out.loc["fk_exists(k)", "violations"] == 1  # 99
        assert (out["n_checked"] == len(df)).all()


def test_fk_exists_distributed_path_and_nulls():
    """fk_exists beyond the broadcast limit takes the left_anti hash
    join path; NULL child keys count as violations on BOTH paths
    (SQL LEFT JOIN semantics)."""
    child = pd.DataFrame(
        {"k": pd.array([1, 2, 99, None, 4, 99, None, 3], dtype="Int64")}
    )
    ref = pd.DataFrame({"rk": np.arange(1, 5, dtype="int64")})
    want_bad = 4  # two 99s + two NULLs
    for nblocks in (1, 3):
        ds = ray.data.from_pandas(child).repartition(nblocks)
        refds = ray.data.from_pandas(ref)
        rules = [{"rule": "fk_exists", "col": "k", "ref": refds, "ref_col": "rk"}]
        # broadcast path (limit above parent count)
        out_b = v.validate(ds, rules, broadcast_limit=100).set_index("rule")
        # distributed left_anti path (limit below parent count)
        out_d = v.validate(ds, rules, broadcast_limit=2).set_index("rule")
        for out in (out_b, out_d):
            assert out.loc["fk_exists(k)", "violations"] == want_bad
            assert out.loc["fk_exists(k)", "n_checked"] == len(child)


def test_validate_clean_data_zero_violations():
    df = pd.DataFrame({"k": [1, 2, 3], "x": [0.1, 0.2, 0.3]})
    out = v.validate(
        ray.data.from_pandas(df),
        [
            {"rule": "not_null", "col": "x"},
            {"rule": "range", "col": "x", "lo": 0.0, "hi": 1.0},
            {"rule": "unique", "col": "k"},
        ],
    )
    assert (out["violations"] == 0).all()


def test_compression_ratio_kernel():
    """compression_ratio_batch equals direct zlib, discriminates
    repetitive vs noisy text, and handles empty docs."""
    import zlib

    from matomo_log_analytics_ray.ops import textstats

    rng = np.random.default_rng(6)
    noise = "".join(chr(33 + i) for i in rng.integers(0, 90, size=400))
    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": ["spam " * 100, noise, ""],
        }
    )
    out = textstats.compression_ratio_batch(df).set_index("doc_id")
    for did, text in zip(df["doc_id"], df["text"]):
        want = (
            round(len(zlib.compress(text.encode(), 6)) / len(text), 6)
            if text
            else 0.0
        )
        assert abs(out.loc[did, "compression_ratio"] - want) < 1e-9
    assert (
        out.loc[0, "compression_ratio"] < out.loc[1, "compression_ratio"]
    )
