"""Checkpointed, resumable pipeline runner with per-partition lineage.

The reference's resume machinery — status lattice in MySQL, resume
offsets, DB-outage recovery journal
(/root/reference/libs/lib_status.py:7-19,
/root/reference/libs/lib_database.py:46-62,101-117,220-228) — becomes:

* partition = unit of work and of retry (the reference's log *file*);
* an append-only JSON journal, one file per completed partition,
  written atomically (tmp + rename) with the partition's metrics
  (rows, bytes, parse failures, per-sink/outcome counts, wall time);
* resume = anti-join of planned partitions vs the journal: completed
  partitions are skipped entirely, no mid-partition offsets needed;
* deterministic per-partition output filenames (out/sink=<k>/
  part-<partition_id>.parquet, tmp + rename), so a retried or resumed
  partition overwrites its own output instead of duplicating rows —
  exact count equality survives retries.

The partition fan-out itself is a Dataset of partition descriptors
mapped through an actor pool; each actor streams one parquet
row-group range through the same vectorized stage kernels as the
flagship pipeline. No shuffle anywhere: routing is row-wise, counters
are journal partials summed on the driver (|sinks| x |outcomes| rows
per partition).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

import pandas as pd
import pyarrow.parquet as pq
import ray

import ray.data

from ..stages import classify, enrich, parse

JOURNAL_DIRNAME = "_journal"


@dataclass
class Partition:
    partition_id: str
    path: str
    rg_start: int
    rg_end: int  # exclusive


def plan_partitions(paths: list[str], row_groups_per_partition: int = 4) -> list[Partition]:
    """One partition per run of row groups per file — the planner's
    analog of the reference's file-level work items."""
    parts: list[Partition] = []
    for p in paths:
        n_rg = pq.ParquetFile(p).metadata.num_row_groups
        stem = os.path.splitext(os.path.basename(p))[0]
        for start in range(0, n_rg, row_groups_per_partition):
            end = min(start + row_groups_per_partition, n_rg)
            parts.append(Partition(f"{stem}-rg{start:04d}", p, start, end))
    return parts


def completed_partitions(journal_dir: str) -> dict[str, dict]:
    """partition_id -> journal record, for every finished partition."""
    out = {}
    if not os.path.isdir(journal_dir):
        return out
    for name in os.listdir(journal_dir):
        if name.endswith(".json"):
            with open(os.path.join(journal_dir, name)) as f:
                rec = json.load(f)
            out[rec["partition_id"]] = rec
    return out


class ProcessPartition:
    """Actor: runs one partition end-to-end (read -> parse -> classify ->
    enrich -> per-sink write -> journal). State (lookup tables) loads
    once per actor."""

    def __init__(self, out_dir: str, tool_sinks_ref=None):
        self.out_dir = out_dir
        self.journal_dir = os.path.join(out_dir, JOURNAL_DIRNAME)
        os.makedirs(self.journal_dir, exist_ok=True)
        self.resolver = enrich.SinkResolver(tool_sinks_ref)

    def _process_one(self, pid: str, path: str, rg_start: int, rg_end: int) -> dict:
        t0 = time.monotonic()
        pf = pq.ParquetFile(path)
        tbl = pf.read_row_groups(list(range(rg_start, rg_end)))
        tbl = parse.parse_batch(tbl)
        tbl = classify.classify_batch(tbl)
        tbl = self.resolver(tbl)

        # Per-sink deterministic write: out/sink=<k>/part-<pid>.parquet
        # (shared atomic split-and-write contract with stages.route)
        import pyarrow.compute as pc

        from ..stages.route import write_table_by_sink

        sink_counts = write_table_by_sink(tbl, self.out_dir, pid)

        vc = pc.value_counts(tbl["outcome"])
        outcome_counts = {
            str(v["values"]): int(v["counts"]) for v in vc.to_pylist()
        }
        rec = {
            "partition_id": pid,
            "path": path,
            "rg_start": rg_start,
            "rg_end": rg_end,
            "rows": len(tbl),
            "bytes": int(tbl.nbytes),
            "parse_failures": int(outcome_counts.get("invalid", 0)),
            "sink_counts": sink_counts,
            "outcome_counts": {str(k): int(v) for k, v in outcome_counts.items()},
            "wall_s": time.monotonic() - t0,
            "status": "LOADED",
        }
        jtmp = os.path.join(self.journal_dir, f"{pid}.json.tmp")
        jdst = os.path.join(self.journal_dir, f"{pid}.json")
        with open(jtmp, "w") as f:
            json.dump(rec, f)
        os.replace(jtmp, jdst)
        return rec

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        recs = [
            self._process_one(r.partition_id, r.path, int(r.rg_start), int(r.rg_end))
            for r in batch.itertuples()
        ]
        return pd.DataFrame(
            [
                {
                    "partition_id": r["partition_id"],
                    "rows": r["rows"],
                    "parse_failures": r["parse_failures"],
                    "wall_s": r["wall_s"],
                }
                for r in recs
            ]
        )


def run_checkpointed(
    input_paths: list[str],
    out_dir: str,
    tool_sinks: dict | None = None,
    row_groups_per_partition: int = 4,
    concurrency: int | tuple | None = None,
    fail_after: int | None = None,
) -> dict:
    """Run (or resume) the pipeline; returns aggregate counters.

    ``fail_after``: process at most this many pending partitions then
    stop (test hook simulating a killed run). A subsequent call with the
    same out_dir resumes, skipping completed partitions.
    """
    if concurrency is None:
        cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
        # autoscaling pool: never demands more actors than partitions,
        # caps at cpus//2 so reads/driver stages are never starved
        concurrency = (1, max(1, cpus // 2))
    parts = plan_partitions(input_paths, row_groups_per_partition)
    journal_dir = os.path.join(out_dir, JOURNAL_DIRNAME)
    done = completed_partitions(journal_dir)
    pending = [p for p in parts if p.partition_id not in done]
    if fail_after is not None:
        pending = pending[:fail_after]

    if pending:
        items = [p.__dict__ for p in pending]
        sinks_ref = ray.put(dict(tool_sinks or enrich.DEFAULT_TOOL_SINKS))
        (
            ray.data.from_items(items, override_num_blocks=len(items))
            .map_batches(
                ProcessPartition,
                fn_constructor_kwargs={
                    "out_dir": out_dir,
                    "tool_sinks_ref": sinks_ref,
                },
                batch_format="pandas",
                batch_size=1,
                concurrency=concurrency,
            )
            .materialize()
        )

    done = completed_partitions(journal_dir)
    sink_counts: dict[str, int] = {}
    outcome_counts: dict[str, int] = {}
    rows = 0
    for rec in done.values():
        rows += rec["rows"]
        for k, v in rec["sink_counts"].items():
            sink_counts[k] = sink_counts.get(k, 0) + v
        for k, v in rec["outcome_counts"].items():
            outcome_counts[k] = outcome_counts.get(k, 0) + v
    return {
        "planned": len(parts),
        "completed": len(done),
        "rows": rows,
        "sink_counts": sink_counts,
        "outcome_counts": outcome_counts,
    }
