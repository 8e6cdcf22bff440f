"""Resume scenario (FIXTURES.md F5): kill after K partitions, resume,
assert zero recompute of completed partitions and final counts equal an
uninterrupted run."""

import json
import os

import duckdb

from matomo_log_analytics_ray import datagen, oracle
from matomo_log_analytics_ray.pipelines import checkpoint


def _oracle_sink_counts(path):
    df = duckdb.sql(
        oracle.sink_outcome_counts_sql(oracle.transcripts_source(path))
    ).df()
    return df.groupby("sink")["n"].sum().astype(int).to_dict()


def test_kill_and_resume_no_recompute(tmp_path):
    path = datagen.transcripts_path("sf0.001")
    out_a = str(tmp_path / "interrupted")
    out_b = str(tmp_path / "clean")

    # interrupted run: only 2 partitions complete
    partial = checkpoint.run_checkpointed(
        [path], out_a, row_groups_per_partition=1, fail_after=2
    )
    assert partial["completed"] == 2 < partial["planned"]

    journal_dir = os.path.join(out_a, checkpoint.JOURNAL_DIRNAME)
    mtimes_before = {
        f: os.path.getmtime(os.path.join(journal_dir, f))
        for f in os.listdir(journal_dir)
        if f.endswith(".json")
    }

    # resume: finishes the rest without touching completed journals
    resumed = checkpoint.run_checkpointed([path], out_a, row_groups_per_partition=1)
    assert resumed["completed"] == resumed["planned"]
    for f, t in mtimes_before.items():
        assert os.path.getmtime(os.path.join(journal_dir, f)) == t, (
            f"completed partition {f} was recomputed"
        )

    # equality with an uninterrupted run and with the DuckDB oracle
    clean = checkpoint.run_checkpointed([path], out_b, row_groups_per_partition=1)
    assert resumed["rows"] == clean["rows"]
    assert resumed["sink_counts"] == clean["sink_counts"]
    assert resumed["outcome_counts"] == clean["outcome_counts"]
    assert resumed["sink_counts"] == _oracle_sink_counts(path)

    # journal metrics are complete per partition (lineage + metrics)
    with open(os.path.join(journal_dir, sorted(os.listdir(journal_dir))[0])) as f:
        rec = json.load(f)
    for key in ("partition_id", "rows", "bytes", "parse_failures", "sink_counts", "wall_s", "status"):
        assert key in rec


def test_rerun_is_idempotent(tmp_path):
    path = datagen.transcripts_path("sf0.001")
    out = str(tmp_path / "o")
    first = checkpoint.run_checkpointed([path], out)
    second = checkpoint.run_checkpointed([path], out)
    assert second["completed"] == first["completed"]
    assert second["rows"] == first["rows"]
    assert second["sink_counts"] == first["sink_counts"]
