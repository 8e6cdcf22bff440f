"""Fan-out routing sink: per-sink partitioned Parquet.

Analog of import_logs.py's Recorder pool posting per-site hit batches
(evidence: the load step /root/reference/README.md:40-46; SURVEY.md
K6): the ``sink`` column drives a hive-partitioned write
(out/sink=<k>/...), so each sink is its own directory — the unit a
downstream consumer (or a resumed run) can address independently.

Filenames are deterministic per (task, block) via a FilenameProvider,
so a retried write task overwrites its own file instead of duplicating
rows — this is what keeps exact count equality under Ray task retries.
"""

from __future__ import annotations

import ray.data
from ray.data.datasource import FilenameProvider


class DeterministicFilenames(FilenameProvider):
    """Stable names: part-<task>-<block>.parquet (no UUIDs)."""

    def get_filename_for_block(self, block, write_uuid, task_index, block_index):
        return f"part-{task_index:05d}-{block_index:05d}.parquet"

    def get_filename_for_row(self, row, write_uuid, task_index, block_index, row_index):
        return (
            f"part-{task_index:05d}-{block_index:05d}-{row_index:08d}.parquet"
        )


def write_routed(
    enriched: "ray.data.Dataset", out_dir: str, colocate_by_sink: bool = False
) -> None:
    """Write the enriched dataset partitioned by sink.

    Default layout is shuffle-free: each task writes its own rows into
    every sink directory it touches (file count = write tasks x sinks
    seen per task, each file a sequential local write). At scale this is
    the right trade — no all-to-all movement of full rows — and file
    sizes grow with block size. ``colocate_by_sink=True`` instead sorts
    by sink first (one range-shuffle of the full rows) yielding ~one
    file per sink; measured 9 files vs 144 on the 600k-turn probe at
    ~2x the write wall time. Use it only when downstream consumers need
    few-files-per-sink more than the pipeline needs write bandwidth.
    """
    if colocate_by_sink:
        enriched = enriched.sort("sink")
    enriched.write_parquet(
        out_dir,
        partition_cols=["sink"],
        filename_provider=DeterministicFilenames(),
        # overwrite semantics + stable names => a retried write task
        # replaces its own file rather than appending a duplicate
        mode="overwrite",
    )
