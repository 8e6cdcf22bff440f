"""Manifest discovery, dedup idempotency (D1), date-status rollup and
work-queue (O1) at the Dataset level."""

import pandas as pd
import ray.data

from matomo_log_analytics_ray.control import datestatus, discovery, status, workqueue

PATHS = [
    # valid scl files across two dates
    {"path": "/l/node03/2021-01-01.log.gz", "size": 10},
    {"path": "/l/hiperion/varnish/2021-01-01.log.gz", "size": 11},
    {"path": "/l/node03/2021-01-02.log.gz", "size": 12},
    # invalid by rule (varnishncsa after cutoff)
    {"path": "/l/varnishncsa/node03/2021-01-03.log.gz", "size": 13},
    # rejected: no server derivable
    {"path": "/l/unknown/2021-01-04.log.gz", "size": 14},
    # rejected: no date
    {"path": "/l/node03/current.log", "size": 15},
]


def _build(existing=None):
    listing = ray.data.from_items(PATHS)
    return discovery.build_manifest(listing, "scl", existing_manifest=existing, concurrency=1)


def test_manifest_routes_instead_of_dropping():
    m = _build().to_pandas().set_index("path")
    assert len(m) == len(PATHS)  # nothing silently dropped
    assert m.loc["/l/node03/2021-01-01.log.gz", "status"] == status.FILE_QUEUE
    assert m.loc["/l/node03/2021-01-01.log.gz", "server"] == "node03"
    assert m.loc["/l/node03/2021-01-01.log.gz", "name"] == "node03-2021-01-01"
    assert m.loc["/l/varnishncsa/node03/2021-01-03.log.gz", "status"] == status.FILE_INVALID
    assert m.loc["/l/unknown/2021-01-04.log.gz", "status"] == discovery.REJECTED
    assert m.loc["/l/node03/current.log", "status"] == discovery.REJECTED


def test_discovery_dedup_idempotent():
    first = _build().materialize()
    again = discovery.build_manifest(
        ray.data.from_items(PATHS), "scl", existing_manifest=first, concurrency=1
    )
    assert again.count() == 0  # run-twice == run-once (D1)


def test_date_status_rollup_and_lattice():
    m = _build().to_pandas()
    # mark both 2021-01-01 files LOADED, leave 01-02 queued
    m.loc[m["date"] == "2021-01-01", "status"] = status.FILE_LOADED
    ds = ray.data.from_pandas(m[m["status"] != discovery.REJECTED])
    rollup = datestatus.rollup_date_status(ds)
    r = rollup.set_index("date")["status"]
    assert r["2021-01-01"] == status.DATE_LOADED  # scl before cutoff expects 2
    assert r["2021-01-02"] == status.DATE_QUEUE
    assert r["2021-01-03"] == status.DATE_QUEUE

    # guarded upgrade: COMPLETED rows never regress
    existing = pd.DataFrame(
        {
            "collection": ["scl"],
            "date": ["2021-01-01"],
            "status": [status.DATE_COMPLETED],
        }
    )
    merged = datestatus.rollup_date_status(ds, existing=existing)
    assert (
        merged.set_index("date")["status"]["2021-01-01"] == status.DATE_COMPLETED
    )


def test_work_queue_sort_desc_and_limit():
    m = _build()
    q = workqueue.recent_work_queue(
        m,
        "scl",
        ignore_status=(status.FILE_LOADED, status.FILE_INVALID, discovery.REJECTED),
        limit=2,
    ).to_pandas()
    assert len(q) == 2
    assert q["date"].tolist() == sorted(q["date"].tolist(), reverse=True)
    assert q["date"].iloc[0] == "2021-01-02"  # newest first


def test_completed_dates_semi_join():
    rollup = pd.DataFrame(
        {
            "collection": ["scl", "scl", "arg"],
            "date": ["2021-01-01", "2021-01-02", "2021-01-01"],
            "status": [5, 2, 5],
        }
    )
    got = workqueue.completed_dates(rollup, "scl", ["2021-01-01", "2021-01-03"])
    assert got["date"].tolist() == ["2021-01-01"]


def test_topk_matches_full_sort():
    import numpy as np
    import pandas as pd
    import ray.data

    from matomo_log_analytics_ray.ops import topk

    rng = np.random.default_rng(5)
    df = pd.DataFrame({"a": rng.integers(0, 50, 5000), "b": np.arange(5000)})
    ds = ray.data.from_pandas(df).repartition(8)
    got = topk.topk(ds, ["a", "b"], 100, descending=True).to_pandas()
    want = df.sort_values(["a", "b"], ascending=False).head(100).reset_index(drop=True)
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)
