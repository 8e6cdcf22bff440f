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


def write_routed(enriched: "ray.data.Dataset", out_dir: str) -> None:
    """Write the enriched dataset partitioned by sink."""
    enriched.write_parquet(
        out_dir,
        partition_cols=["sink"],
        filename_provider=DeterministicFilenames(),
        # overwrite semantics + stable names => a retried write task
        # replaces its own file rather than appending a duplicate
        mode="overwrite",
    )
