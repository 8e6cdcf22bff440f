"""Skew-aware grouped aggregation: salt -> partial -> unsalt -> final.

The transcripts table is Zipf-skewed on conv_id (datagen.py): a naive
``groupby(conv_id)`` routes every row of a hot conversation to one
reduce partition. The salted two-phase shape bounds any single reduce
task: each batch first combines locally per key (which already folds a
hot key's rows within the batch), then rows carry a bounded salt so
the first shuffle spreads a hot key over ``n_salts`` partitions; the
second, tiny aggregation removes the salt. This is the pattern the
north star mandates for per-site hit counts over hot conv_ids
(BASELINE.json north_star; SURVEY.md section 4 "skew / stragglers").
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Sum



def per_key_counts_salted(
    ds: "ray.data.Dataset", key: str, n_salts: int = 16
) -> "ray.data.Dataset":
    """(key) -> n, with hot keys salted across ``n_salts`` partitions.

    Returns a Dataset with columns (key, n). Deterministic output; the
    salt derives from a batch-local row index, not randomness.
    """

    def partial_with_salt(batch: pa.Table) -> pa.Table:
        # local combine first: one row per key per batch
        g = batch.select([key]).group_by([key]).aggregate([([], "count_all")])
        g = g.rename_columns([key, "n"])
        # Salt must VARY across a key's partials or the first shuffle
        # still funnels every partial of a hot key to one reducer (a
        # key-hash salt is a no-op — each key always lands in the same
        # bucket). Position within the batch's partial table differs
        # across batches, so a hot key's per-batch partials spread over
        # the salt range; final sums are associative, so the choice of
        # salt never affects output values.
        salt = pa.array((np.arange(len(g)) % n_salts).astype(np.int32))
        return g.append_column("salt", salt)

    salted = ds.map_batches(partial_with_salt, batch_format="pyarrow")
    first = salted.groupby([key, "salt"]).aggregate(Sum("n", alias_name="n"))
    final = first.groupby(key).aggregate(Sum("n", alias_name="n"))
    return final


def sorted_group_sum(
    rows: "ray.data.Dataset",
    key_cols: list[str],
    val_col: "str | list[str]",
    alias: "str | list[str]" = "s",
) -> "ray.data.Dataset":
    """groupby(key_cols).sum(val_col) for HIGH-CARDINALITY keys via
    sort + vectorized run reduction (the ops/dedup.sorted_group_counts
    shape with a sum measure): interior runs collapse in-block with
    numpy; each block's first/last run forwards ONE pre-reduced
    (key, partial_sum) row to the single merge pass, so a hot key
    never funnels raw rows. Sums accumulate in float64. ``val_col`` /
    ``alias`` may be parallel lists to sum several measures in the
    same single sort (one shuffle instead of one per measure)."""
    val_cols = [val_col] if isinstance(val_col, str) else list(val_col)
    aliases = [alias] if isinstance(alias, str) else list(alias)
    if len(val_cols) != len(aliases):
        raise ValueError("val_col and alias must have the same length")

    sorted_ds = rows.sort(key_cols)

    def block_fn(b: pd.DataFrame) -> pd.DataFrame:
        from .rank import _run_bounds

        n = len(b)
        if n == 0:
            out = {c: pd.Series([], dtype=b[c].dtype) for c in key_cols}
            for a in aliases:
                out[a] = pd.Series([], dtype="float64")
            out["kind"] = pd.Series([], dtype=object)
            return pd.DataFrame(out)
        starts, ends = _run_bounds(b, key_cols)
        last = len(starts) - 1
        # per-run DIRECT sums (add.reduceat), not cumsum differences: a
        # block-wide running total can pass 2^53 and silently break the
        # exact-integer fixed-point gates (q3) even when every RUN sum
        # is comfortably exact
        run_sums = {
            a: np.add.reduceat(b[v].to_numpy(dtype=np.float64), starts)
            for v, a in zip(val_cols, aliases)
        }
        interior = (np.arange(last + 1) != 0) & (np.arange(last + 1) != last)
        rows_out = b.iloc[starts[interior]][key_cols].copy()
        for a in aliases:
            rows_out[a] = run_sums[a][interior]
        rows_out["kind"] = "done"
        edge_runs = [0] if last == 0 else [0, last]
        edges = b.iloc[[starts[r] for r in edge_runs]][key_cols].copy()
        for a in aliases:
            edges[a] = run_sums[a][edge_runs]
        edges["kind"] = "edge"
        return pd.concat([rows_out, edges], ignore_index=True)

    from . import drop_empty_blocks

    # see ops/dedup.sorted_group_counts: clean the block list so the
    # done/edge filter maps never see an empty block
    tagged = drop_empty_blocks(
        sorted_ds.map_batches(block_fn, batch_format="pandas").materialize()
    )
    done = tagged.map_batches(
        lambda b: b[b["kind"] == "done"][[*key_cols, *aliases]],
        batch_format="pandas",
    )

    def edge_sums(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            out = {c: pd.Series([], dtype=b[c].dtype) for c in key_cols}
            for a in aliases:
                out[a] = pd.Series([], dtype="float64")
            return pd.DataFrame(out)
        return b.groupby(key_cols, as_index=False, sort=False)[aliases].sum()

    edges = (
        tagged.map_batches(
            lambda b: b[b["kind"] == "edge"][[*key_cols, *aliases]],
            batch_format="pandas",
        )
        .repartition(1)
        .map_batches(edge_sums, batch_format="pandas")
    )
    return done.union(edges)
