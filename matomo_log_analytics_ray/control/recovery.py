"""Recovery journal: TSV fallback when the metrics store is unavailable.

Analog of the reference's DB-outage path
(/root/reference/libs/lib_database.py:154-159,187-189,220-228 write;
:192-217 replay): when a partition's metrics row cannot be persisted,
append `(partition_id, expected_rows, parsed_rows, status)` to a
per-partition TSV under the recovery directory; a later replay turns
each journal row into a metrics row with zeroed breakdowns (exactly the
reference's zero-fill on replay) and returns SUCCESSFUL_RECOVERY.
"""

from __future__ import annotations

import os

import pandas as pd

from .status import CRITICAL_ERROR, SUCCESSFUL_RECOVERY  # noqa: F401  (re-export)

_METRIC_ZERO_FIELDS = [
    "total_imported_lines",
    "total_ignored_lines",
    "sum_imported_ignored_lines",
    "ignored_lines_filtered",
    "ignored_lines_http_errors",
    "ignored_lines_http_redirects",
    "ignored_lines_invalid",
    "ignored_lines_bots",
    "ignored_lines_static_resources",
    "total_time",
]


def write_recovery_row(
    recovery_dir: str,
    partition_id: str,
    expected_rows: int,
    parsed_rows,
    status,
) -> int:
    """Append one recovery row; returns CRITICAL_ERROR (the caller's
    result code for 'metrics not persisted', as in the reference)."""
    os.makedirs(recovery_dir, exist_ok=True)
    path = os.path.join(recovery_dir, f"{partition_id}.tsv")
    with open(path, "a") as f:
        f.write(
            "\t".join(str(v) for v in [partition_id, expected_rows, parsed_rows, status])
            + "\n"
        )
    return CRITICAL_ERROR


def read_recovery_rows(recovery_dir: str) -> pd.DataFrame:
    """All journal rows across partition TSVs, in append order."""
    rows = []
    if os.path.isdir(recovery_dir):
        for name in sorted(os.listdir(recovery_dir)):
            if not name.endswith(".tsv"):
                continue
            with open(os.path.join(recovery_dir, name)) as f:
                for line in f:
                    parts = line.rstrip("\n").split("\t")
                    if len(parts) == 4:
                        rows.append(parts)
    return pd.DataFrame(
        rows, columns=["partition_id", "total_lines", "lines_parsed", "status"]
    )


def replay_recovery(recovery_dir: str) -> tuple[pd.DataFrame, int]:
    """Turn journal rows into metrics rows with zero-filled breakdowns
    (reference zero-fill: /root/reference/libs/lib_database.py:199-207).
    Returns (metrics_df, SUCCESSFUL_RECOVERY)."""
    j = read_recovery_rows(recovery_dir)
    out = pd.DataFrame(
        {
            "partition_id": j["partition_id"],
            "total_lines": pd.to_numeric(j["total_lines"], errors="coerce").fillna(0).astype("int64"),
            "lines_parsed": pd.to_numeric(j["lines_parsed"], errors="coerce").fillna(0).astype("int64"),
            "status": pd.to_numeric(j["status"], errors="coerce").fillna(0).astype("int64"),
        }
    )
    for col in _METRIC_ZERO_FIELDS:
        out[col] = 0
    return out, SUCCESSFUL_RECOVERY
