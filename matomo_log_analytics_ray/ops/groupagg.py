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
