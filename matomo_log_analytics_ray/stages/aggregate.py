"""Counter aggregation: Statistics re-expressed as data.

The reference's Statistics counters
(/root/reference/libs/lib_summary.py:10-20) become a groupby over the
single ``outcome`` column per sink (SURVEY.md A7). Scale shape: a
partial combiner inside map_batches collapses every batch to at most
|sinks| x |outcomes| rows BEFORE the shuffle, so the global groupby
moves a few hundred rows per block regardless of input size — this is
the salt-free equivalent of salted hot-key aggregation (the hot key's
rows are already combined inside each block; block assignment plays the
role of the salt, and the final Sum reassociates the partials).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray.data
from ray.data.aggregate import Sum


def partial_outcome_counts(batch: pa.Table) -> pd.DataFrame:
    """Per-batch combiner: (sink, outcome) -> partial count + bytes."""
    df = batch.select(["sink", "outcome", "bytes"]).to_pandas()
    df["bytes"] = df["bytes"].fillna(0)
    g = (
        df.groupby(["sink", "outcome"], as_index=False, sort=False)
        .agg(n=("outcome", "size"), total_bytes=("bytes", "sum"))
    )
    g["n"] = g["n"].astype("int64")
    g["total_bytes"] = g["total_bytes"].astype("int64")
    return g


def sink_outcome_counts(enriched: "ray.data.Dataset") -> "ray.data.Dataset":
    """(sink, outcome) -> n, total_bytes. Partial-combine then tiny shuffle."""
    return (
        enriched.map_batches(partial_outcome_counts, batch_format="pyarrow")
        .groupby(["sink", "outcome"])
        .aggregate(Sum("n", alias_name="n"), Sum("total_bytes", alias_name="total_bytes"))
    )


def global_counters(sink_counts: pd.DataFrame) -> dict:
    """Collapse the per-sink table into the reference's global counter
    vector (names per /root/reference/libs/lib_summary.py:10-20)."""
    by_outcome = sink_counts.groupby("outcome")["n"].sum().to_dict()
    total = int(sink_counts["n"].sum())
    imported = int(by_outcome.get("imported", 0))
    counters = {
        "lines_parsed": total,
        "requests_imported_successfully": imported,
        "filtered_log_lines": int(by_outcome.get("filtered", 0)),
        "http_errors": int(by_outcome.get("http_error", 0)),
        "http_redirects": int(by_outcome.get("http_redirect", 0)),
        "invalid_log_lines": int(by_outcome.get("invalid", 0)),
        "requests_done_by_bots": int(by_outcome.get("bot", 0)),
        "requests_to_static_resources": int(by_outcome.get("static", 0)),
    }
    counters["requests_ignored"] = total - imported
    counters["sum_imported_ignored_lines"] = total  # A4 conservation identity
    return counters
