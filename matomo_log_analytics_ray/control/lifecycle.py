"""Lifecycle GC: archive + delete artifacts of COMPLETED dates.

Analog of proc/clean_data.py (/root/reference/proc/clean_data.py:21-58,
70-113): list a directory of date-named artifact files, extract each
file's date (M8), semi-join against the rollup's COMPLETED dates (J2/
F4), then tar.gz pretable files into the archive dir and delete the
originals; r5-metric files are deleted without archiving. Driver-side
by design — this is small-file housekeeping, not data-plane work.
"""

from __future__ import annotations

import os
import tarfile

import pandas as pd

from . import dates, workqueue


def _dated_files(directory: str) -> pd.DataFrame:
    names = sorted(os.listdir(directory)) if os.path.isdir(directory) else []
    df = pd.DataFrame({"name": names})
    df["date"] = dates.extract_date(df["name"]) if len(df) else pd.Series([], dtype=object)
    return df


def files_to_remove(
    rollup: pd.DataFrame,
    collection: str,
    directory: str,
    extension: str,
    prefix: str = "",
) -> list[str]:
    """Paths (reconstructed `<prefix><date>.<extension>`, as the
    reference does) for every COMPLETED date found in the directory."""
    listed = _dated_files(directory)
    completed = workqueue.completed_dates(
        rollup, collection, [d for d in listed["date"] if d]
    )
    return [
        os.path.join(directory, f"{prefix}{d}.{extension}")
        for d in completed["date"]
    ]


def archive_and_remove(paths: list[str], archive_dir: str) -> list[str]:
    """tar.gz each file into archive_dir then delete the original
    (K3 semantics); returns the archive paths."""
    os.makedirs(archive_dir, exist_ok=True)
    out = []
    for p in paths:
        if not os.path.exists(p):
            continue
        dest = os.path.join(archive_dir, os.path.basename(p) + ".tar.gz")
        with tarfile.open(dest, "w:gz") as tar:
            tar.add(p, arcname=os.path.basename(p))
        os.remove(p)
        out.append(dest)
    return out


def remove(paths: list[str]) -> list[str]:
    """Delete without archiving (K4 semantics, r5-metric files)."""
    out = []
    for p in paths:
        if os.path.exists(p):
            os.remove(p)
            out.append(p)
    return out


def clean_completed(
    rollup: pd.DataFrame,
    collection: str,
    dir_pretables: str,
    dir_archive: str,
    dir_r5: str,
) -> dict:
    """Full clean_data flow: archive pretables (.tsv), delete r5 csvs."""
    pre = files_to_remove(rollup, collection, dir_pretables, "tsv")
    archived = archive_and_remove(pre, dir_archive)
    r5 = files_to_remove(rollup, collection, dir_r5, "csv", prefix="r5-metrics-")
    removed = remove(r5)
    return {"archived": archived, "removed": removed}


def compact_partitions(
    out_dir: str, target_rows_per_file: int = 1_000_000
) -> dict[str, tuple[int, int]]:
    """Coalesce the small files a shuffle-free routed write leaves
    behind (stages/route.write_routed: file count = write tasks x sinks
    touched) into ~target_rows_per_file files per partition directory.

    One Ray task PER PARTITION DIRECTORY (sink=<k>/...), so compaction
    parallelizes across partitions and never shuffles rows between
    them. Each task streams its files through a ParquetWriter (memory
    is one row-group, not the partition), writes ``compact-*.tmp``
    files, then renames them and deletes the originals — a crash leaves
    either the old files intact or both (rerun cleans up); it never
    loses rows. Returns {partition: (files_before, files_after)}.
    """
    import ray

    part_dirs = sorted(
        os.path.join(out_dir, d)
        for d in os.listdir(out_dir)
        if os.path.isdir(os.path.join(out_dir, d)) and "=" in d
    )

    @ray.remote
    def compact_one(pdir: str) -> tuple[str, int, int]:
        import pyarrow.parquet as pq

        old = sorted(
            os.path.join(pdir, f)
            for f in os.listdir(pdir)
            if f.endswith(".parquet") and not f.startswith("compact-")
        )
        # leftover tmp files from a crashed run
        for f in os.listdir(pdir):
            if f.endswith(".tmp"):
                os.unlink(os.path.join(pdir, f))
        if len(old) <= 1:
            return os.path.basename(pdir), len(old), len(old)
        schema = pq.read_schema(old[0])
        writer = None
        out_idx = rows_in_file = 0
        tmp_files: list[str] = []

        def roll():
            nonlocal writer, out_idx, rows_in_file
            if writer is not None:
                writer.close()
            path = os.path.join(pdir, f"compact-{out_idx:05d}.parquet.tmp")
            tmp_files.append(path)
            writer = pq.ParquetWriter(path, schema)
            out_idx += 1
            rows_in_file = 0

        roll()
        for f in old:
            pf = pq.ParquetFile(f)
            for batch in pf.iter_batches():
                if rows_in_file >= target_rows_per_file:
                    roll()
                writer.write_batch(batch)
                rows_in_file += batch.num_rows
        writer.close()
        for t in tmp_files:
            os.rename(t, t[: -len(".tmp")])
        for f in old:
            os.unlink(f)
        return os.path.basename(pdir), len(old), len(tmp_files)

    results = ray.get([compact_one.remote(d) for d in part_dirs])
    return {name: (before, after) for name, before, after in results}
