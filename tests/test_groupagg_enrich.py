"""Salted grouped aggregation + resolver-kernel parity."""

import duckdb
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
