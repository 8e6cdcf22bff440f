"""End-to-end `load_logs` lifecycle: the reconstructed missing entry
point of the reference (SURVEY.md §3.2; documented run
/root/reference/README.md:40-46, per-file flow implied by the
unconsumed API of /root/reference/libs/lib_database.py:30-62,101-217).

One orchestration over Ray Data stages:

1. discovery   - listing -> manifest (server/date extraction, presence
                 gate, validity routing)                       [3.1]
2. work queue  - newest-first top-k of non-terminal files       [O1]
3. load        - checkpointed partition runner over each queued
                 file's transcript shards (journal + per-sink
                 deterministic outputs; resume skips completed) [3.2]
4. status      - journal outcomes lattice-merged into the manifest
                 (LOADED absorbing, T1)
5. rollup      - per-(collection, date) completeness through the
                 piecewise expected-count table (A1/A2, T2)

The "log file" unit of the reference maps to one (logical_path,
parquet_path) pair: the logical path carries the routing/date
metadata (as the reference's filesystem layout does), the parquet file
holds that file's transcript rows.
"""

from __future__ import annotations

import os

import pandas as pd
import ray

import ray.data

from ..control import datestatus, discovery, status, workqueue
from . import checkpoint


def run_load_logs(
    files: list[tuple[str, str]],
    collection: str,
    out_dir: str,
    limit: int = 1000,
    fail_after: int | None = None,
    row_groups_per_partition: int = 4,
) -> dict:
    """Run (or resume) the full lifecycle; returns manifest, rollup and
    aggregate counters.

    ``files``: (logical_path, parquet_path) pairs. ``fail_after`` stops
    the load step after N partitions (kill simulation); calling again
    with the same ``out_dir`` resumes from the journal.
    """
    logical_to_parquet = dict(files)

    # 1. discovery over the logical listing
    listing = ray.data.from_items(
        [{"path": lp, "size": os.path.getsize(pp)} for lp, pp in files]
    )
    manifest = discovery.build_manifest(listing, collection).to_pandas()

    # 2. newest-first work queue of non-terminal files
    queue = workqueue.recent_work_queue(
        ray.data.from_pandas(manifest), collection, limit=limit
    ).to_pandas()

    # 3. checkpointed load of the queued files' shards
    # (an all-rejected/invalid listing yields an EMPTY queue whose
    # to_pandas() has no columns at all — treat it as zero work, not
    # a KeyError)
    queued_paths = queue["path"] if "path" in queue.columns else pd.Series([], dtype=str)
    queued_parquets = [logical_to_parquet[p] for p in queued_paths]
    counters = checkpoint.run_checkpointed(
        queued_parquets,
        out_dir,
        fail_after=fail_after,
        row_groups_per_partition=row_groups_per_partition,
    )

    # 4. journal -> file status, lattice-merged (T1: LOADED absorbing).
    # A file is LOADED when every planned partition of its parquet has a
    # journal record; partially-journaled files stay PARTIAL.
    done = checkpoint.completed_partitions(
        os.path.join(out_dir, checkpoint.JOURNAL_DIRNAME)
    )
    done_by_path: dict[str, int] = {}
    for rec in done.values():
        done_by_path[rec["path"]] = done_by_path.get(rec["path"], 0) + 1
    planned_by_path = {
        p: sum(
            1
            for part in checkpoint.plan_partitions([p], row_groups_per_partition)
        )
        for p in set(queued_parquets)
    }

    def proposed_status(lp: str) -> int:
        pp = logical_to_parquet.get(lp)
        if pp is None or pp not in planned_by_path:
            return status.FILE_QUEUE
        n_done = done_by_path.get(pp, 0)
        if n_done >= planned_by_path[pp]:
            return status.FILE_LOADED
        return status.FILE_PARTIAL if n_done > 0 else status.FILE_QUEUE

    in_queue = manifest["path"].isin(set(queued_paths))
    proposed = manifest["status"].copy()
    proposed[in_queue] = (
        manifest.loc[in_queue, "path"].map(proposed_status).astype(proposed.dtype)
    )
    manifest["status"] = status.merge_file_status(manifest["status"], proposed)

    # 5. per-date completeness rollup (A1/A2 via the piecewise table)
    rollup = datestatus.rollup_date_status(ray.data.from_pandas(manifest))

    return {
        "manifest": manifest,
        "rollup": rollup,
        "counters": counters,
        "queued": len(queue),
    }
