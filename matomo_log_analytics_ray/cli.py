"""CLI entry points — the Ray-native equivalents of the reference's
console scripts (`setup.py:24-27`: initialize_database,
update_available_logs, clean_data; plus the documented-but-missing
load_logs, README.md:40-46). Composable `--execution_mode` steps follow
proc/update_available_logs.py:26-34.

Usage (a script may own the Ray session; the library never does):

    python -m matomo_log_analytics_ray.cli init --out ctl/
    python -m matomo_log_analytics_ray.cli discover \
        --listing paths.parquet --collection scl --out ctl/ \
        --execution_mode update_table_log_file --execution_mode update_table_date_status
    python -m matomo_log_analytics_ray.cli load \
        --files files.parquet --collection scl --out out/
    python -m matomo_log_analytics_ray.cli clean \
        --rollup ctl/date_status.parquet --collection scl \
        --pretables p/ --archive a/ --r5 r/
"""

from __future__ import annotations

import argparse
import os
import sys

from matomo_log_analytics_ray import io as mla_io


def _ensure_ray() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "0")) or None,
            include_dashboard=False,
            logging_level="ERROR",
        )


def cmd_init(args) -> int:
    """K5 bootstrap: write empty-schema control tables."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from . import schemas

    os.makedirs(args.out, exist_ok=True)
    for name, schema in (
        ("manifest", schemas.MANIFEST),
        ("partition_metrics", schemas.PARTITION_METRICS),
    ):
        dest = os.path.join(args.out, f"{name}.parquet")
        if not os.path.exists(dest):
            pq.write_table(schema.empty_table(), dest)
    print(f"initialized control tables under {args.out}")
    return 0


def cmd_discover(args) -> int:
    """update_available_logs: discovery and/or date-status rollup."""
    _ensure_ray()
    import pandas as pd
    import pyarrow.parquet as pq
    import ray.data

    from .control import datestatus, discovery

    modes = args.execution_mode or ["update_table_log_file", "update_table_date_status"]
    manifest_path = os.path.join(args.out, "manifest.parquet")
    if "update_table_log_file" in modes:
        listing = mla_io.read_parquet(args.listing)
        if "collection" in listing.schema().names:
            listing = listing.map_batches(
                lambda b, c=args.collection: b[b["collection"] == c][["path"]],
                batch_format="pandas",
            )
        existing = None
        if os.path.exists(manifest_path):
            existing = mla_io.read_parquet(manifest_path)
        new_rows = discovery.build_manifest(
            listing, args.collection, existing_manifest=existing
        )
        # Distributed merge: Dataset union + parallel parquet write —
        # no driver-side to_pandas/concat, so discovery scales with
        # file count (the manifest is ~1 row per input file, but at
        # 100x file counts a driver concat is the one hot spot).
        # manifest.parquet is a DIRECTORY of part files; both
        # ray.data.read_parquet and pandas.read_parquet accept it.
        merged = new_rows if existing is None else existing.union(new_rows)
        os.makedirs(args.out, exist_ok=True)
        import shutil

        tmp = manifest_path + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        merged.write_parquet(tmp)
        n_rows = sum(
            pq.read_metadata(os.path.join(tmp, f)).num_rows
            for f in os.listdir(tmp)
            if f.endswith(".parquet")
        )
        # swap (two renames; the .old backup keeps a crash recoverable)
        backup = manifest_path + ".old"
        shutil.rmtree(backup, ignore_errors=True)
        if os.path.isfile(backup):
            os.remove(backup)
        if os.path.exists(manifest_path):
            os.replace(manifest_path, backup)
        os.replace(tmp, manifest_path)
        shutil.rmtree(backup, ignore_errors=True)
        if os.path.isfile(backup):
            os.remove(backup)
        print(f"manifest: {n_rows} rows -> {manifest_path}")
    if "update_table_date_status" in modes:
        import pandas as pd

        if not os.path.exists(manifest_path):
            print(
                f"error: {manifest_path} not found — run with "
                "--execution_mode update_table_log_file first to build the manifest"
            )
            return 1
        rollup_path = os.path.join(args.out, "date_status.parquet")
        existing_rollup = (
            pd.read_parquet(rollup_path) if os.path.exists(rollup_path) else None
        )
        rollup = datestatus.rollup_date_status(
            mla_io.read_parquet(manifest_path), existing=existing_rollup
        )
        tmp = rollup_path + ".tmp"
        rollup.to_parquet(tmp, index=False)
        os.replace(tmp, rollup_path)
        print(f"date_status: {len(rollup)} rows -> {rollup_path}")
    return 0


def cmd_load(args) -> int:
    """load_logs: discovery -> queue -> checkpointed load -> rollup."""
    _ensure_ray()
    import pandas as pd

    from .pipelines import lifecycle

    fdf = pd.read_parquet(args.files)
    files = list(zip(fdf["logical_path"], fdf["parquet_path"]))
    res = lifecycle.run_load_logs(
        files, args.collection, args.out, limit=args.limit
    )
    print(
        f"loaded {res['counters']['completed']}/{res['counters']['planned']} partitions, "
        f"{res['counters']['rows']} rows; rollup rows: {len(res['rollup'])}"
    )
    if args.compact:
        # opt-in post-load compaction: the shuffle-free routed write
        # trades file count for zero data movement (files = partitions
        # x sinks touched, stages/route.py) — at 100x partition counts
        # downstream readers want the coalesce pass one flag away
        from .control import lifecycle as gc

        stats = gc.compact_partitions(
            args.out, target_rows_per_file=args.compact_target_rows
        )
        before = sum(b for b, _ in stats.values())
        after = sum(a for _, a in stats.values())
        print(f"compacted: {before} -> {after} files across {len(stats)} partitions")
    return 0


def cmd_clean(args) -> int:
    """clean_data: archive pretables / delete r5 csvs for COMPLETED dates."""
    import pandas as pd

    from .control import lifecycle as gc

    rollup = pd.read_parquet(args.rollup)
    res = gc.clean_completed(
        rollup, args.collection, args.pretables, args.archive, args.r5
    )
    print(f"archived {len(res['archived'])}, removed {len(res['removed'])}")
    return 0


def cmd_prep(args) -> int:
    """Training-data preparation: dedup -> quality/lang filter ->
    tokenize -> split -> partitioned parquet (pipelines/prepare)."""
    import ray.data

    from .pipelines import prepare

    _ensure_ray()
    docs = mla_io.read_parquet(args.docs, columns=["doc_id", "text"])
    counts = prepare.prepare_training_data(
        docs, out_dir=args.out, quality_min=args.quality_min
    )
    for _, r in counts.iterrows():
        print(f"{r['split']}: {r['n_docs']} docs, {r['total_tokens']} tokens")
    return 0


def cmd_compact(args) -> int:
    """Coalesce small files in a partitioned output directory."""
    from .control import lifecycle as gc

    _ensure_ray()
    stats = gc.compact_partitions(args.dir, target_rows_per_file=args.target_rows)
    for part, (before, after) in sorted(stats.items()):
        print(f"{part}: {before} -> {after} files")
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="matomo_log_analytics_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("init", help="bootstrap empty control tables (K5)")
    sp.add_argument("--out", required=True)
    sp.set_defaults(fn=cmd_init)

    sp = sub.add_parser("discover", help="update_available_logs analog")
    sp.add_argument("--listing", required=True, help="parquet of candidate paths")
    sp.add_argument("--collection", required=True)
    sp.add_argument("--out", required=True, help="control-table directory")
    sp.add_argument(
        "--execution_mode",
        action="append",
        choices=["update_table_log_file", "update_table_date_status"],
    )
    sp.set_defaults(fn=cmd_discover)

    sp = sub.add_parser("load", help="load_logs analog (checkpointed, resumable)")
    sp.add_argument(
        "--files", required=True, help="parquet with (logical_path, parquet_path)"
    )
    sp.add_argument("--collection", required=True)
    sp.add_argument("--out", required=True)
    sp.add_argument("--limit", type=int, default=1000)
    sp.add_argument(
        "--compact",
        action="store_true",
        help="coalesce each sink partition's small files after the load",
    )
    sp.add_argument("--compact_target_rows", type=int, default=1_000_000)
    sp.set_defaults(fn=cmd_load)

    sp = sub.add_parser("clean", help="clean_data analog (archive + delete)")
    sp.add_argument("--rollup", required=True)
    sp.add_argument("--collection", required=True)
    sp.add_argument("--pretables", required=True)
    sp.add_argument("--archive", required=True)
    sp.add_argument("--r5", required=True)
    sp.set_defaults(fn=cmd_clean)

    sp = sub.add_parser(
        "prep", help="training-data preparation (dedup/filter/tokenize/split)"
    )
    sp.add_argument("--docs", required=True, help="documents parquet (doc_id, text)")
    sp.add_argument("--out", required=True, help="output dir (partitioned by split)")
    sp.add_argument("--quality_min", type=float, default=0.3)
    sp.set_defaults(fn=cmd_prep)

    sp = sub.add_parser("compact", help="coalesce small files per partition dir")
    sp.add_argument("--dir", required=True)
    sp.add_argument("--target_rows", type=int, default=1_000_000)
    sp.set_defaults(fn=cmd_compact)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
