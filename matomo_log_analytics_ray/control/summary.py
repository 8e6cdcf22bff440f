"""Import-summary text parser.

Re-expression of the reference summary parser
(/root/reference/libs/lib_summary.py:33-119): the printed "Logs import
summary" of an import run is scanned in REVERSED line order in three
passes — counter extraction (stop once all eight counters have been
seen at least once), total-time extraction, then status / lines_parsed
resolution with a ±1-line tolerance window and the RETRY_DIFF_LINES
safety subtraction on partial retries. Per-document logic is pure
Python (each summary is a few dozen lines); ``parse_summaries_batch``
vectorizes across many summaries inside map_batches.
"""

from __future__ import annotations

import os
import re

import pandas as pd

from .status import FILE_FAILED, FILE_LOADED, FILE_PARTIAL

# Safety margin of lines re-imported when resuming a partial import
# (/root/reference/libs/lib_summary.py:8,82-84).
RETRY_DIFF_LINES = int(os.environ.get("RETRY_DIFF_LINES", "110000"))

# The eight counter attributes extracted from summary lines; the printed
# label is the attribute name with spaces. Scanned in sorted order — a
# line matching several labels credits the alphabetically first.
COUNTER_ATTRS = sorted(
    [
        "filtered_log_lines",
        "http_errors",
        "http_redirects",
        "invalid_log_lines",
        "requests_done_by_bots",
        "requests_ignored",
        "requests_imported_successfully",
        "requests_to_static_resources",
    ]
)

_LABEL_RE = {a: re.compile(a.replace("_", " ")) for a in COUNTER_ATTRS}
_NUM_RE = re.compile(r"[0-9]+")
_TIME_RE = re.compile(r"total time")


def _normalize(raw_text: str) -> list[str]:
    """strip + lower + drop empty lines, preserving file order
    (/root/reference/libs/lib_summary.py:114-117)."""
    return [ln for ln in (line.strip().lower() for line in raw_text.splitlines()) if ln]


def _scan_counters(lines: list[str], out: dict) -> None:
    seen: set[str] = set()
    for ln in reversed(lines):
        for attr in COUNTER_ATTRS:
            if _LABEL_RE[attr].search(ln):
                m = _NUM_RE.search(ln)
                if m:
                    out[attr] = int(m.group())
                    seen.add(attr)
                break  # first matching label consumes the line
        if len(seen) == len(COUNTER_ATTRS):
            break


def _scan_total_time(lines: list[str], out: dict) -> None:
    for ln in reversed(lines):
        if _TIME_RE.search(ln):
            m = _NUM_RE.search(ln)
            if m:
                out["total_time"] = int(m.group())
            break


def _resolve_status(lines: list[str], out: dict, expected: int) -> None:
    total = out["requests_imported_successfully"] + out["requests_ignored"]
    out["sum_imported_ignored_lines"] = total

    if expected - 1 <= total <= expected + 1:
        out["status"] = FILE_LOADED
        out["lines_parsed"] = total
        return

    # Failure path: last 'lines parsed' line having exactly four integers
    # carries the true parsed count as its first integer.
    for ln in reversed(lines):
        if "lines parsed" in ln:
            nums = _NUM_RE.findall(ln)
            if len(nums) == 4:
                parsed = int(nums[0])
                if expected - 1 <= parsed <= expected + 1:
                    out["lines_parsed"] = parsed
                    out["status"] = FILE_LOADED
                elif parsed - RETRY_DIFF_LINES > 0:
                    out["lines_parsed"] = parsed - RETRY_DIFF_LINES
                    out["status"] = FILE_PARTIAL
                else:
                    out["lines_parsed"] = 0
                    out["status"] = FILE_FAILED
            else:
                out["lines_parsed"] = 0
                out["status"] = FILE_FAILED
            break


def parse_summary_text(raw_text: str, expected_lines: int) -> dict:
    """Parse one summary document into the counter dict."""
    lines = _normalize(raw_text)
    out = {a: 0 for a in COUNTER_ATTRS}
    out.update({"lines_parsed": 0, "total_time": 0, "status": 0})
    _scan_counters(lines, out)
    _scan_total_time(lines, out)
    _resolve_status(lines, out, expected_lines)
    return out


def read_and_parse_summaries(
    summary_paths: list[str], expected_lines: dict[str, int]
) -> "pd.DataFrame":
    """S3 source analog: read whole summary files (ray.data.read_text
    is line-oriented; summaries are documents, so read_binary_files
    with paths keeps one row per file), normalize, parse. Returns one
    metrics row per file keyed by basename."""
    import os

    import ray.data

    ds = ray.data.read_binary_files(summary_paths, include_paths=True)

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for path, raw in zip(batch["path"], batch["bytes"]):
            name = os.path.basename(path)
            rows.append(
                {
                    "summary_id": name,
                    **parse_summary_text(
                        raw.decode("utf-8", "replace"), int(expected_lines.get(name, 0))
                    ),
                }
            )
        return pd.DataFrame(rows)

    return ds.map_batches(fn, batch_format="pandas").to_pandas()


def parse_summaries_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """map_batches body: expects columns (summary_id, text,
    expected_lines); returns one metrics row per summary."""
    rows = [
        {"summary_id": sid, **parse_summary_text(txt, int(exp))}
        for sid, txt, exp in zip(
            batch["summary_id"], batch["text"], batch["expected_lines"]
        )
    ]
    return pd.DataFrame(rows)
