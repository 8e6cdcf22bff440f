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
    is one row-group, not the partition).

    Crash-safe commit protocol (rerun always converges, never loses or
    duplicates rows, safe against power loss as well as process
    crashes): every output tmp is fsync'd, then a manifest listing the
    consumed sources and the final output names is fsync-renamed into
    place (file + parent directory fsync) BEFORE any rename — so the
    manifest can never become durable while the outputs it points at
    are not — then tmps are renamed and sources deleted (directory
    fsync'd again), then the manifest is removed. A rerun first REPLAYS any manifest it finds
    (finish pending renames, delete listed sources) — so a crash at
    any point leaves a state the next run completes rather than
    re-reads. Previously-compacted files are ordinary inputs to the
    next generation (rerunning compaction is a no-op only when a
    single file remains). Returns {partition: (files_before,
    files_after)}.
    """
    import ray

    part_dirs = sorted(
        os.path.join(out_dir, d)
        for d in os.listdir(out_dir)
        if os.path.isdir(os.path.join(out_dir, d)) and "=" in d
    )

    @ray.remote
    def compact_one(pdir: str) -> tuple[str, int, int]:
        import json as _json
        import re as _re

        import pyarrow.parquet as pq

        def fsync_path(path: str) -> None:
            fd = os.open(path, os.O_RDONLY)
            try:
                os.fsync(fd)
            finally:
                os.close(fd)

        manifest_path = os.path.join(pdir, "_compact_manifest.json")
        if os.path.exists(manifest_path):
            # a prior run crashed after committing its manifest: its
            # outputs are complete (as tmp or final) — finish the
            # renames and source deletes it had already committed to
            with open(manifest_path) as f:
                m = _json.load(f)
            for final in m["outputs"]:
                fp = os.path.join(pdir, final)
                if not os.path.exists(fp) and os.path.exists(fp + ".tmp"):
                    os.rename(fp + ".tmp", fp)
            for src in m["sources"]:
                sp = os.path.join(pdir, src)
                if os.path.exists(sp):
                    os.unlink(sp)
            os.unlink(manifest_path)
        # tmps not covered by a manifest are from a crash BEFORE the
        # commit point: safe to discard
        for f in os.listdir(pdir):
            if f.endswith(".tmp"):
                os.unlink(os.path.join(pdir, f))

        names = sorted(f for f in os.listdir(pdir) if f.endswith(".parquet"))
        old = [os.path.join(pdir, f) for f in names]
        if len(old) <= 1:
            return os.path.basename(pdir), len(old), len(old)
        gens = [
            int(g.group(1))
            for g in (_re.match(r"compact-g(\d+)-", f) for f in names)
            if g
        ]
        gen = (max(gens) + 1) if gens else 0
        schema = pq.read_schema(old[0])
        writer = None
        out_idx = rows_in_file = 0
        out_names: list[str] = []

        def roll():
            nonlocal writer, out_idx, rows_in_file
            if writer is not None:
                writer.close()
            name = f"compact-g{gen:03d}-{out_idx:05d}.parquet"
            out_names.append(name)
            writer = pq.ParquetWriter(os.path.join(pdir, name + ".tmp"), schema)
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
        # durability barrier: every output tmp must be on disk BEFORE
        # the manifest can become durable, else a power loss could
        # leave a durable manifest pointing at truncated outputs that
        # the replay path would rename into place while deleting the
        # sources (data loss)
        for name in out_names:
            fsync_path(os.path.join(pdir, name + ".tmp"))
        # commit point: manifest in place => outputs are authoritative
        tmp_manifest = manifest_path + ".tmp"
        with open(tmp_manifest, "w") as f:
            _json.dump({"sources": names, "outputs": out_names}, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp_manifest, manifest_path)
        fsync_path(pdir)  # make the manifest rename itself durable
        for name in out_names:
            fp = os.path.join(pdir, name)
            os.rename(fp + ".tmp", fp)
        for f in old:
            os.unlink(f)
        fsync_path(pdir)  # renames + deletes durable before dropping the manifest
        os.unlink(manifest_path)
        return os.path.basename(pdir), len(old), len(out_names)

    results = ray.get([compact_one.remote(d) for d in part_dirs])
    return {name: (before, after) for name, before, after in results}
