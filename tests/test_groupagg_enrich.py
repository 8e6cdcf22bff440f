"""Salted grouped aggregation + resolver-kernel parity."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from matomo_log_analytics_ray import datagen
from matomo_log_analytics_ray.ops import groupagg
from matomo_log_analytics_ray.stages import enrich


def test_salted_per_key_counts_match_oracle():
    path = datagen.transcripts_path("sf0.001")
    ds = ray.data.read_parquet(path, columns=["conv_id"])
    got = (
        groupagg.per_key_counts_salted(ds, "conv_id")
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    want = (
        duckdb.sql(
            f"SELECT conv_id, CAST(COUNT(*) AS BIGINT) AS n "
            f"FROM read_parquet('{path}') GROUP BY conv_id ORDER BY conv_id"
        )
        .df()
        .reset_index(drop=True)
    )
    assert got["conv_id"].tolist() == want["conv_id"].tolist()
    assert got["n"].astype(int).tolist() == want["n"].astype(int).tolist()
    # the Zipf head exists: hottest conversation has many turns
    assert got["n"].max() >= 32


def test_arrow_resolver_matches_pandas_reference():
    df = pd.DataFrame(
        {
            "conv_id": ["conv-00000000", "conv-00000001", "conv-00000007", "x"],
            "role": ["user", "system", "tool", "assistant"],
            "tool": ["", "", "bash", "unknown-tool"],
        }
    )
    want = enrich.resolve_sinks(
        df["conv_id"], df["role"], df["tool"], enrich.DEFAULT_TOOL_SINKS
    ).tolist()
    got = enrich.resolve_sinks_arrow(
        pa.Table.from_pandas(df), enrich.DEFAULT_TOOL_SINKS
    )["sink"].to_pylist()
    assert got == want
    assert want == ["site-0", "system", "tool-bash", "site-0"]


def test_dynamic_site_resolver_first_seen_allocation():
    import numpy as np
    import ray
    import ray.data

    from matomo_log_analytics_ray.stages import dynamic_resolver

    hosts = ["a.example", "b.example", "c.example", None, "a.example"] * 200
    df = pd.DataFrame({"vhost": hosts, "x": np.arange(len(hosts))})
    ds = ray.data.from_pandas(df).repartition(5)
    out, registry = dynamic_resolver.resolve_site_ids(ds, concurrency=(1, 3))
    res = out.to_pandas().sort_values("x").reset_index(drop=True)
    snap = ray.get(registry.snapshot.remote())
    # contiguous first-seen ids; every distinct host assigned exactly one
    assert sorted(snap.values()) == [1, 2, 3]
    assert set(snap) == {"a.example", "b.example", "c.example"}
    # same host -> same id everywhere, across batches and actors
    for h, i in snap.items():
        got = res.loc[res["vhost"] == h, "site_id"].unique().tolist()
        assert got == [i]
    # null host -> null site_id
    assert res.loc[res["vhost"].isna(), "site_id"].isna().all()
    # seeding keeps prior ids stable across a "second run"
    ds2 = ray.data.from_pandas(pd.DataFrame({"vhost": ["d.example", "a.example"]}))
    out2, reg2 = dynamic_resolver.resolve_site_ids(ds2, seed=snap)
    out2.materialize()  # lazy dataset: registry only fills once consumed
    snap2 = ray.get(reg2.snapshot.remote())
    assert snap2["a.example"] == snap["a.example"] and snap2["d.example"] == 4


def test_sorted_group_sum_matches_pandas():
    from matomo_log_analytics_ray.ops import groupagg

    rng = np.random.default_rng(5)
    n = 4000
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 50, size=n),
            "k2": rng.choice(["a", "b"], size=n),
            "v": rng.uniform(-10, 10, size=n),
        }
    )
    df.loc[: n // 2, "k"] = 13  # hot key spanning blocks
    want = df.groupby(["k", "k2"], as_index=False)["v"].sum()
    for nblocks in (1, 11):
        ds = ray.data.from_pandas(df).repartition(nblocks)
        got = (
            groupagg.sorted_group_sum(ds, ["k", "k2"], "v", alias="s")
            .to_pandas()
            .sort_values(["k", "k2"])
            .reset_index(drop=True)
        )
        m = got.merge(want, on=["k", "k2"])
        assert len(m) == len(want) == len(got)
        assert np.allclose(m["s"], m["v"], atol=1e-9)


def test_sorted_group_sum_multi_measure_matches_single():
    """Two measures in one sort == two independent single-measure runs."""
    import numpy as np
    import pandas as pd
    import ray.data

    from matomo_log_analytics_ray.ops import groupagg

    rng = np.random.default_rng(11)
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 40, 1000),
            "v": rng.normal(size=1000),
            "w": rng.integers(0, 5, 1000).astype("float64"),
        }
    )
    ds = ray.data.from_pandas(df).repartition(7)
    both = (
        groupagg.sorted_group_sum(ds, ["k"], ["v", "w"], alias=["sv", "sw"])
        .to_pandas()
        .groupby("k", as_index=False)[["sv", "sw"]]
        .sum()
        .sort_values("k")
        .reset_index(drop=True)
    )
    ref = (
        df.groupby("k", as_index=False)
        .agg(sv=("v", "sum"), sw=("w", "sum"))
        .sort_values("k")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(both, ref, check_dtype=False, atol=1e-9)
