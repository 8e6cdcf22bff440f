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
