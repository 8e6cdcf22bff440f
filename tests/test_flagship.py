"""End-to-end golden run (SURVEY.md section 5.2): flagship pipeline on
deterministic synthetic transcripts vs the DuckDB oracle built from the
SAME regex/lookup constants — exact per-sink aggregate-count equality,
routed-row equality, per-turn text equality under stable
(conv_id, turn_idx) ordering, counter conservation."""

import os

import duckdb
import pandas as pd
import ray

from matomo_log_analytics_ray import datagen, oracle
from matomo_log_analytics_ray.pipelines import flagship
from matomo_log_analytics_ray.stages import aggregate


def _small_path():
    return datagen.transcripts_path("sf0.001")


def test_flagship_counts_match_duckdb_oracle(tmp_path):
    path = _small_path()
    out_dir = str(tmp_path / "routed")
    result = flagship.run_flagship(path, out_dir=out_dir)

    got = (
        result["sink_counts"]
        .sort_values(["sink", "outcome"])
        .reset_index(drop=True)
    )
    want = (
        duckdb.sql(oracle.sink_outcome_counts_sql(oracle.transcripts_source(path)))
        .df()
        .sort_values(["sink", "outcome"])
        .reset_index(drop=True)
    )
    assert got["sink"].tolist() == want["sink"].tolist()
    assert got["outcome"].tolist() == want["outcome"].tolist()
    assert got["n"].astype(int).tolist() == want["n"].astype(int).tolist()
    assert (
        got["total_bytes"].astype(int).tolist()
        == want["total_bytes"].astype(int).tolist()
    )

    # counter conservation (A4/A5 analog): outcomes partition the input
    counters = result["counters"]
    total = duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{path}')"
    ).fetchone()[0]
    assert counters["lines_parsed"] == total
    assert (
        counters["requests_imported_successfully"] + counters["requests_ignored"]
        == counters["sum_imported_ignored_lines"]
        == total
    )
    breakdown = (
        counters["filtered_log_lines"]
        + counters["http_errors"]
        + counters["http_redirects"]
        + counters["invalid_log_lines"]
        + counters["requests_done_by_bots"]
        + counters["requests_to_static_resources"]
    )
    assert breakdown == counters["requests_ignored"]

    # routed fan-out wrote one directory per sink
    sinks = sorted(d for d in os.listdir(out_dir) if d.startswith("sink="))
    assert sinks == sorted("sink=" + s for s in got["sink"].unique())


def test_routed_rows_equal_oracle_under_stable_order():
    path = _small_path()
    ds = flagship.build_pipeline(path)
    sink = "tool-bash"
    got = (
        ds.filter(expr=f"sink == '{sink}'")
        .select_columns(["conv_id", "turn_idx", "role", "text", "outcome"])
        .sort(["conv_id", "turn_idx"])
        .to_pandas()
    )
    want = duckdb.sql(
        oracle.routed_rows_sql(oracle.transcripts_source(path), sink)
    ).df()
    assert len(got) == len(want) > 0
    # per-turn text equality under stable (conv_id, turn_idx) order
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True), check_dtype=False
    )


def test_global_counters_shape():
    df = pd.DataFrame(
        {
            "sink": ["a", "a", "b"],
            "outcome": ["imported", "bot", "imported"],
            "n": [10, 2, 5],
            "total_bytes": [0, 0, 0],
        }
    )
    c = aggregate.global_counters(df)
    assert c["lines_parsed"] == 17
    assert c["requests_imported_successfully"] == 15
    assert c["requests_ignored"] == 2
    assert c["requests_done_by_bots"] == 2


def test_colocated_write_same_rows_fewer_files(tmp_path):
    import glob

    import duckdb
    import ray.data

    from matomo_log_analytics_ray import datagen
    from matomo_log_analytics_ray.pipelines import flagship
    from matomo_log_analytics_ray.stages import route

    p = datagen.transcripts_path("sf0.001")
    out_a, out_b = str(tmp_path / "default"), str(tmp_path / "colocated")
    ds = flagship.build_pipeline(ray.data.read_parquet(p).repartition(4))
    route.write_routed(ds, out_a)
    ds = flagship.build_pipeline(ray.data.read_parquet(p).repartition(4))
    route.write_routed(ds, out_b, colocate_by_sink=True)
    fa = glob.glob(out_a + "/sink=*/**/*.parquet", recursive=True)
    fb = glob.glob(out_b + "/sink=*/**/*.parquet", recursive=True)
    assert len(fb) < len(fa)
    con = duckdb.connect()
    q = "SELECT conv_id, turn_idx FROM read_parquet('{}/sink=*/*.parquet', hive_partitioning=1) ORDER BY 1, 2"
    assert con.execute(q.format(out_a)).df().equals(con.execute(q.format(out_b)).df())


def test_single_pass_write_and_counts(tmp_path):
    """write_routed_with_counts: ONE consumption writes the routed files
    AND yields the same counter table as a separate aggregate pass; the
    written files round-trip to the same per-sink row counts; rerunning
    into the same out_dir leaves an identical file list (idempotent)."""
    import glob

    import duckdb

    from matomo_log_analytics_ray.stages import route

    path = _small_path()
    out_dir = str(tmp_path / "routed")
    ds = flagship.build_pipeline(path)
    counts = route.write_routed_with_counts(ds, out_dir)

    ds2 = flagship.build_pipeline(path)
    want = aggregate.sink_outcome_counts(ds2)
    pd.testing.assert_frame_equal(
        counts.reset_index(drop=True), want.reset_index(drop=True)
    )

    con = duckdb.connect()
    on_disk = con.execute(
        f"SELECT sink, CAST(COUNT(*) AS BIGINT) AS n FROM "
        f"read_parquet('{out_dir}/sink=*/*.parquet', hive_partitioning=1) "
        f"GROUP BY sink ORDER BY sink"
    ).df()
    from_counts = (
        counts.groupby("sink", as_index=False)["n"].sum().sort_values("sink")
    )
    assert on_disk["sink"].tolist() == from_counts["sink"].tolist()
    assert on_disk["n"].astype(int).tolist() == from_counts["n"].astype(int).tolist()

    files_before = sorted(glob.glob(out_dir + "/sink=*/*.parquet"))
    ds3 = flagship.build_pipeline(path)
    route.write_routed_with_counts(ds3, out_dir)
    files_after = sorted(glob.glob(out_dir + "/sink=*/*.parquet"))
    assert files_before == files_after
