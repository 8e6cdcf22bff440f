"""Integration test of the reconstructed `load_logs` lifecycle
(SURVEY.md §3.2): discovery -> work queue -> checkpointed load ->
status lattice -> date rollup, including kill-and-resume."""

import os

import pyarrow.parquet as pq

from matomo_log_analytics_ray import datagen
from matomo_log_analytics_ray.control import status
from matomo_log_analytics_ray.pipelines import lifecycle

LOGICALS = [
    "/usage/scl/node03/2021-05-20.log.gz",            # valid, expected=2 that day
    "/usage/scl/hiperion/varnish/2021-05-20.log.gz",  # valid, same day
    "/usage/scl/node03/2021-05-27.log.gz",            # valid, expected=1 (> 2021-05-25)
    "/usage/scl/varnishncsa/node03/2021-05-27.log.gz",  # INVALID (anon-IP rule)
    "/usage/scl/node03/nodate.log.gz",                # REJECTED (no date)
]


def _mk_files(tmp_path):
    files = []
    for i, lp in enumerate(LOGICALS):
        pp = str(tmp_path / f"shard-{i}.parquet")
        pq.write_table(datagen.generate_transcripts(2000, seed=100 + i), pp,
                       row_group_size=500)
        files.append((lp, pp))
    return files


def test_full_lifecycle_with_kill_and_resume(tmp_path):
    files = _mk_files(tmp_path)
    out = str(tmp_path / "out")

    # killed run: only 1 partition completes
    r1 = lifecycle.run_load_logs(files, "scl", out, fail_after=1)
    assert r1["queued"] == 3  # invalid + rejected files never enter the queue
    m1 = r1["manifest"].set_index("path")["status"]
    assert (m1[LOGICALS[:3]] == status.FILE_LOADED).sum() == 1
    assert m1[LOGICALS[3]] == status.FILE_INVALID
    assert m1[LOGICALS[4]] == -99  # REJECTED side-output, kept not dropped

    journal = os.path.join(out, "_journal")
    mtimes = {f: os.path.getmtime(os.path.join(journal, f)) for f in os.listdir(journal)}

    # resumed run completes the rest without rewriting finished journals
    r2 = lifecycle.run_load_logs(files, "scl", out)
    for f, t in mtimes.items():
        assert os.path.getmtime(os.path.join(journal, f)) == t
    m2 = r2["manifest"].set_index("path")["status"]
    assert (m2[LOGICALS[:3]] == status.FILE_LOADED).all()
    assert m2[LOGICALS[3]] == status.FILE_INVALID

    # date rollup: both dates fully LOADED under the piecewise table
    # (2 files expected on 2021-05-20, 1 on 2021-05-27; the INVALID
    # file does not count toward completeness)
    roll = r2["rollup"].set_index("date")["status"]
    assert roll["2021-05-20"] == status.DATE_LOADED
    assert roll["2021-05-27"] == status.DATE_LOADED

    # counters: every valid file's rows were routed exactly once
    assert r2["counters"]["rows"] == 3 * 2000
    assert sum(r2["counters"]["outcome_counts"].values()) == 3 * 2000


def test_partial_date_is_partial(tmp_path):
    # only one of the two expected 2021-05-20 files exists -> PARTIAL
    files = _mk_files(tmp_path)[:1]
    out = str(tmp_path / "out")
    r = lifecycle.run_load_logs(files, "scl", out)
    roll = r["rollup"].set_index("date")["status"]
    assert roll["2021-05-20"] == status.DATE_PARTIAL


def test_all_rejected_listing_is_zero_work(tmp_path):
    # a listing whose every path fails discovery (no date / bad shape)
    # yields an EMPTY work queue — to_pandas() of an empty Dataset has
    # no columns, which must read as "no work", not a KeyError
    pp = str(tmp_path / "shard.parquet")
    pq.write_table(datagen.generate_transcripts(500, seed=1), pp)
    files = [("/logs/whatever/nodate.log.gz", pp)]
    res = lifecycle.run_load_logs(files, "scl", str(tmp_path / "out"))
    assert res["queued"] == 0
    assert res["counters"]["planned"] == 0
