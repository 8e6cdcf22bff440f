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


def partial_outcome_counts(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: (sink, outcome) -> partial count + bytes.
    Pure-Arrow group_by (no pandas conversion in the hot path)."""
    import pyarrow.compute as pc

    t = batch.select(["sink", "outcome", "bytes"])
    t = t.set_column(
        2, "bytes", pc.coalesce(t["bytes"], pa.scalar(0, pa.int64()))
    )
    g = t.group_by(["sink", "outcome"]).aggregate(
        [("bytes", "sum"), ([], "count_all")]
    )
    return g.rename_columns(["sink", "outcome", "total_bytes", "n"])


def combine_partial_counts(t: pa.Table) -> pa.Table:
    """Merge partial count rows (second tree level): sum n and bytes."""
    g = t.group_by(["sink", "outcome"]).aggregate(
        [("total_bytes", "sum"), ("n", "sum")]
    )
    return g.rename_columns(["sink", "outcome", "total_bytes", "n"])


def sink_outcome_counts(
    enriched: "ray.data.Dataset", fanin: int | None = None
) -> pd.DataFrame:
    """(sink, outcome) -> n, total_bytes as a small DataFrame.

    Tree reduce instead of a Ray groupby shuffle: per-batch partials
    (<= |sinks| x |outcomes| rows each) stream to the driver and merge
    in one pandas groupby. Measured: Ray's sort-based groupby spent
    ~8 s shuffling 16k partial rows across 256 blocks; streaming the
    partials costs ~10 ms. ``fanin`` inserts an intermediate
    repartition+combine level for extreme block counts (≳100k blocks,
    where driver-side partials would be GBs); it is a barrier, so leave
    it off below that scale.
    """
    partials = enriched.map_batches(partial_outcome_counts, batch_format="pyarrow")
    if fanin:
        partials = partials.repartition(fanin).map_batches(
            combine_partial_counts, batch_format="pyarrow"
        )
    return merge_partial_counts(partials.to_pandas())


def merge_partial_counts(df: pd.DataFrame) -> pd.DataFrame:
    """Driver-side merge of streamed (sink, outcome, n, total_bytes)
    partial rows into the final counter table."""
    out = df.groupby(["sink", "outcome"], as_index=False, sort=True).agg(
        n=("n", "sum"), total_bytes=("total_bytes", "sum")
    )
    out["n"] = out["n"].astype("int64")
    out["total_bytes"] = out["total_bytes"].astype("int64")
    return out[["sink", "outcome", "n", "total_bytes"]]


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
