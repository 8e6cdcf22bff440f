"""Round-3 composed gates (q18 / daily top-k / funnel trio /
paragraph dedup) replay their DuckDB oracles at sf0.001 — a faster
in-suite twin of tools/check_oracle.py for the newest entries."""

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as entrymod

SF = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

NEW_GATES = [
    "q18_large_orders",
    "daily_top_event_types",
    "funnel_signup_purchase",
    "cohort_retention",
    "debounce_events",
    "paragraph_dedup_docs",
    "bloom_semi_join_orders",
    "blended_quality_topk",
    "user_cooccurrence",
    "char_entropy",
    "rolling_7d_active_users",
    "ann_join_nn",
    "semantic_decontam",
    "per_source_cap",
    # conv_reassemble is NOT here: its oracle reads the sf0.01
    # transcript fixture by the driver contract, so the sf0.001
    # comparison is structurally mismatched; tools/check_oracle.py
    # and the driver gate it at sf0.01.
    "fuzzy_pairs",
    "user_type_entropy",
    "source_vocab_overlap",
    "winsorized_mean",
    "user_median_value",
    "user_mode_type",
    "mean_gap_per_type",
    "validate_lineitem",
    "psi_value_drift",
    "token_budget_select",
    "ann_join_probe2",
    "distinct_ngram_ratio",
    "cube_event_day",
    "decayed_user_activity",
    "quantile_sketch_value",
    "grouped_quantile_sketch",
    "k3_gc_manifest",
    "skew_join_segment_value",
    "m3_m4_server_extract",
    "s3_summary_read",
]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        elif df[c].dtype == object or str(df[c].dtype) == "string":
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


def _to_df(res):
    if isinstance(res, pd.DataFrame):
        return res
    return res.to_pandas()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


@pytest.mark.parametrize("name", NEW_GATES)
def test_gate_matches_oracle_sf0001(name, con):
    got = _canon(_to_df(entrymod.queries()[name](SF)))
    want = _canon(con.sql(entrymod.oracle_sql()[name]).df())
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
