"""CLI entry points (reference console-script analogs)."""

import os

import pandas as pd
import pyarrow.parquet as pq

from matomo_log_analytics_ray import cli, datagen


def _fixture(tmp_path):
    paths = [
        "/usage/scl/node03/2021-05-27.log.gz",
        "/usage/scl/node03/nodate.log.gz",
    ]
    listing = str(tmp_path / "listing.parquet")
    pd.DataFrame({"path": paths}).to_parquet(listing, index=False)
    pp = str(tmp_path / "shard0.parquet")
    pq.write_table(datagen.generate_transcripts(500, seed=3), pp, row_group_size=250)
    files = str(tmp_path / "files.parquet")
    pd.DataFrame(
        [{"logical_path": paths[0], "parquet_path": pp}]
    ).to_parquet(files, index=False)
    return listing, files


def test_init_discover_load_roundtrip(tmp_path):
    listing, files = _fixture(tmp_path)
    ctl, out = str(tmp_path / "ctl"), str(tmp_path / "out")
    assert cli.main(["init", "--out", ctl]) == 0
    assert cli.main(["discover", "--listing", listing, "--collection", "scl", "--out", ctl]) == 0
    m1 = pd.read_parquet(os.path.join(ctl, "manifest.parquet"))
    assert len(m1) == 2  # valid + rejected (kept)
    # idempotent re-discovery (D1): no duplicate rows
    assert cli.main(["discover", "--listing", listing, "--collection", "scl", "--out", ctl]) == 0
    m2 = pd.read_parquet(os.path.join(ctl, "manifest.parquet"))
    assert len(m2) == 2
    assert cli.main(["load", "--files", files, "--collection", "scl", "--out", out]) == 0
    assert os.path.isdir(os.path.join(out, "_journal"))
    roll = pd.read_parquet(os.path.join(ctl, "date_status.parquet"))
    assert set(roll.columns) >= {"collection", "date", "status"}


def test_load_with_compact_flag(tmp_path):
    """`load --compact`: the routed write's many small per-partition
    files coalesce in place, with no row lost or duplicated."""
    import glob

    listing, files = _fixture(tmp_path)
    out = str(tmp_path / "out")
    assert (
        cli.main(
            [
                "load", "--files", files, "--collection", "scl",
                "--out", out, "--compact", "--compact_target_rows", "100000",
            ]
        )
        == 0
    )
    after = glob.glob(f"{out}/sink=*/*.parquet")
    assert after
    # one file per sink dir after compaction at this tiny size
    sinks = {os.path.dirname(f) for f in after}
    assert len(after) == len(sinks)
    total = sum(pd.read_parquet(f).shape[0] for f in after)
    # every parsed row of the 500-turn shard lands in exactly one sink
    uncompacted = str(tmp_path / "out2")
    assert cli.main(
        ["load", "--files", files, "--collection", "scl", "--out", uncompacted]
    ) == 0
    total2 = sum(
        pd.read_parquet(f).shape[0]
        for f in glob.glob(f"{uncompacted}/sink=*/*.parquet")
    )
    assert total == total2


def test_prep_and_compact_commands(tmp_path):
    import numpy as np

    docs = pd.DataFrame(
        {
            "doc_id": np.arange(200, dtype=np.int64),
            "text": [
                "the data and the model of the train value " * 3 + f"tail{i}"
                for i in range(200)
            ],
        }
    )
    dpath = str(tmp_path / "docs.parquet")
    docs.to_parquet(dpath, index=False)
    out = str(tmp_path / "prepared")
    assert cli.main(["prep", "--docs", dpath, "--out", out]) == 0
    import glob

    files = glob.glob(f"{out}/split=*/*.parquet")
    assert files
    assert cli.main(["compact", "--dir", out, "--target_rows", "100000"]) == 0
    after = glob.glob(f"{out}/split=*/*.parquet")
    assert len(after) <= len(files)
    total = sum(pd.read_parquet(f).shape[0] for f in after)
    assert total == 200  # unique texts, all prose: nothing dropped
