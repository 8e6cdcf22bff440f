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

import hashlib
import os

import pandas as pd

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


def write_table_by_sink(tbl, out_dir: str, part_name: str) -> dict[str, int]:
    """Split an Arrow table by its ``sink`` column and atomically write
    one parquet file per sink (out/sink=<k>/part-<part_name>.parquet,
    tmp + os.replace so a retried task overwrites rather than appends).
    Pure-Arrow split (unique + mask filter, no Python row lists).
    Returns per-sink row counts. Shared by the single-pass routed write
    and the checkpoint runner so the write contract lives in one place.
    """
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    sink_col = tbl["sink"]
    counts: dict[str, int] = {}
    for s in pc.unique(sink_col):
        sub = tbl.filter(pc.equal(sink_col, s))
        sink_dir = os.path.join(out_dir, f"sink={s.as_py()}")
        os.makedirs(sink_dir, exist_ok=True)
        dest = os.path.join(sink_dir, f"part-{part_name}.parquet")
        tmp = dest + ".tmp"
        pq.write_table(sub.drop_columns(["sink"]), tmp)
        os.replace(tmp, dest)
        counts[str(s.as_py())] = len(sub)
    return counts


def _make_write_and_count(out_dir: str):
    """Batch fn: write this batch's rows per-sink AND return the batch's
    (sink, outcome, n, total_bytes) partial counters — the single-pass
    fusion of K6 (fan-out recorder) and A7 (Statistics counters).

    Filenames are content-derived (hash over the batch's ENTIRE
    (conv_id, turn_idx) key columns): Ray Data blocks have
    deterministic lineage, so a retried task re-derives the same name
    and overwrites its own file instead of appending a duplicate —
    the same idempotency contract as DeterministicFilenames. Hashing
    the full key stream (not first/last + count) means two DIFFERENT
    batches cannot collide unless their key columns are byte-identical
    — i.e. the same span ingested twice, which is input duplication,
    not a naming artifact.
    """
    import pyarrow as pa

    from . import aggregate

    def fn(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return aggregate.partial_outcome_counts(batch)
        import numpy as np

        keys = batch.select(["conv_id", "turn_idx"]).to_pandas()
        row_hashes = pd.util.hash_pandas_object(keys, index=False).to_numpy(
            dtype=np.uint64
        )
        part = hashlib.sha1(row_hashes.tobytes()).hexdigest()[:16]
        write_table_by_sink(batch, out_dir, part)
        return aggregate.partial_outcome_counts(batch)

    return fn


def write_routed_with_counts(
    enriched: "ray.data.Dataset", out_dir: str
) -> "pd.DataFrame":
    """Single-pass routed write + counter rollup: ONE consumption of the
    lazy graph writes out/sink=<k>/part-*.parquet and streams per-batch
    (sink, outcome) partials to the driver, which merges them into the
    same table aggregate.sink_outcome_counts would produce. At 100 TB
    this halves the scan+parse cost vs writing and aggregating as two
    separate consumptions of the pipeline.
    """
    import shutil

    from . import aggregate

    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)  # overwrite semantics, like write_parquet
    os.makedirs(out_dir, exist_ok=True)
    partials = enriched.map_batches(
        _make_write_and_count(out_dir), batch_format="pyarrow"
    )
    return aggregate.merge_partial_counts(partials.to_pandas())
