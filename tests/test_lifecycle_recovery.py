"""Lifecycle GC (K3/K4), recovery journal (T3/S5), summary-file source (S3)."""

import os
import tarfile

import pandas as pd

from matomo_log_analytics_ray.control import lifecycle, recovery, status, summary


def _rollup():
    return pd.DataFrame(
        {
            "collection": ["scl", "scl", "scl"],
            "date": ["2021-01-01", "2021-01-02", "2021-01-03"],
            "status": [status.DATE_COMPLETED, status.DATE_LOADED, status.DATE_COMPLETED],
        }
    )


def test_clean_completed_archives_and_deletes(tmp_path):
    pre = tmp_path / "pretables"
    arc = tmp_path / "archive"
    r5 = tmp_path / "r5"
    pre.mkdir()
    r5.mkdir()
    for d in ["2021-01-01", "2021-01-02", "2021-01-03"]:
        (pre / f"{d}.tsv").write_text("data\t1\n")
        (r5 / f"r5-metrics-{d}.csv").write_text("a,b\n")

    out = lifecycle.clean_completed(_rollup(), "scl", str(pre), str(arc), str(r5))

    # only COMPLETED dates (01, 03) archived+removed; LOADED (02) kept
    assert sorted(os.listdir(pre)) == ["2021-01-02.tsv"]
    assert sorted(os.listdir(arc)) == ["2021-01-01.tsv.tar.gz", "2021-01-03.tsv.tar.gz"]
    assert sorted(os.listdir(r5)) == ["r5-metrics-2021-01-02.csv"]
    assert len(out["archived"]) == 2 and len(out["removed"]) == 2
    # archive round-trips
    with tarfile.open(arc / "2021-01-01.tsv.tar.gz") as t:
        assert t.getnames() == ["2021-01-01.tsv"]


def test_gc_workspace_gate_side_effects(tmp_path):
    """The k3_gc_manifest gate fixture through the REAL GC paths:
    completed-date files archived/deleted, junk and non-completed
    files untouched, and a rerun is a no-op (idempotent)."""
    import shutil

    from matomo_log_analytics_ray import datagen

    ws = datagen.gc_workspace_dir()
    pre = tmp_path / "pretables"
    r5 = tmp_path / "r5"
    shutil.copytree(os.path.join(ws, "pretables"), pre)
    shutil.copytree(os.path.join(ws, "r5"), r5)
    rollup = pd.read_parquet(os.path.join(ws, "rollup.parquet"))
    listing = pd.read_parquet(os.path.join(ws, "listing.parquet"))
    completed = set(
        rollup[
            (rollup["collection"] == "scl")
            & (rollup["status"] == status.DATE_COMPLETED)
        ]["date"]
    )
    res = lifecycle.clean_completed(
        rollup, "scl", str(pre), str(tmp_path / "arc"), str(r5)
    )
    # every archived/deleted file was a completed-date file
    for p in res["archived"]:
        name = os.path.basename(p)[: -len(".tar.gz")]
        assert name[:10] in completed and name.endswith(".tsv")
        assert not (pre / name).exists()
        assert os.path.exists(p)
    for p in res["removed"]:
        assert os.path.basename(p)[11:21] in completed
        assert not os.path.exists(p)
    # junk (date-free) files and non-completed dates untouched
    assert (pre / "README.txt").exists()
    assert (pre / "notes-final.tsv").exists()
    assert (r5 / "r5-metrics-latest.csv").exists()
    survivors = listing[
        (listing["dir"] == "pretables")
        & (~listing["date"].isin(completed))
    ]["name"]
    for name in survivors:
        assert (pre / name).exists(), name
    # rerun: nothing left to do
    res2 = lifecycle.clean_completed(
        rollup, "scl", str(pre), str(tmp_path / "arc"), str(r5)
    )
    assert res2 == {"archived": [], "removed": []}


def test_recovery_write_and_replay(tmp_path):
    rec = str(tmp_path / "recovery")
    code = recovery.write_recovery_row(rec, "p-0001", 1000, 900, status.FILE_PARTIAL)
    assert code == status.CRITICAL_ERROR
    recovery.write_recovery_row(rec, "p-0001", 1000, 1000, status.FILE_LOADED)
    recovery.write_recovery_row(rec, "p-0002", 500, 0, status.FILE_FAILED)

    replayed, code = recovery.replay_recovery(rec)
    assert code == status.SUCCESSFUL_RECOVERY
    assert len(replayed) == 3  # one metrics row per journal row (per attempt)
    # zero-filled breakdowns, as in the reference replay
    assert (replayed["ignored_lines_bots"] == 0).all()
    assert (replayed["total_time"] == 0).all()
    p1 = replayed[replayed["partition_id"] == "p-0001"]
    assert p1["lines_parsed"].max() == 1000  # A3 resume offset = max over attempts


def test_read_and_parse_summaries_pipeline(tmp_path):
    a = tmp_path / "node03-2021-01-01.log.gz.summary.txt"
    a.write_text("100 requests imported successfully\n30 requests ignored\nTotal time: 9 seconds\n")
    b = tmp_path / "node03-2021-01-02.log.gz.summary.txt"
    b.write_text("5 requests imported successfully\n1 requests ignored\n")
    out = summary.read_and_parse_summaries(
        [str(a), str(b)],
        expected_lines={a.name: 130, b.name: 999},
    ).set_index("summary_id")
    assert out.loc[a.name, "status"] == status.FILE_LOADED
    assert out.loc[a.name, "lines_parsed"] == 130
    assert out.loc[a.name, "total_time"] == 9
    assert out.loc[b.name, "status"] == 0  # unresolved: no tolerance hit, no 'lines parsed' line
