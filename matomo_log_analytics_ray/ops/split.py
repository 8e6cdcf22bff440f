"""Deterministic dataset splitting and stratified sampling.

Training-data plumbing the reference never needed (its unit of work is
a log file, not an example). Both operators are pure stateless
``map_batches`` projections — no shuffle, no state, reproducible on any
cluster shape:

* hash_split          assign each row to train/val/test by a
                      deterministic hash bucket of its id — the
                      standard leakage-safe split (same id always lands
                      in the same split, independent of row order,
                      partitioning, or cluster size).
* stratified_sample   k rows per group, chosen by hash order — a
                      composition of the same deterministic hash with
                      ops/topk.grouped_topk, so the "random" sample is
                      stable across runs and re-partitions.

Two hash flavors: ``knuth_bucket`` (32-bit multiplicative, exactly
expressible in SQL — the driver-gate flavor) and the stronger
``hashing.mix`` splitmix64 (the default for real use at scale, where
ids exceed 32 bits).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data

from . import hashing
from . import topk

KNUTH = np.uint64(2654435761)
_M32 = np.uint64(0xFFFFFFFF)


def knuth_bucket(ids: np.ndarray, n_buckets: int = 1000) -> np.ndarray:
    """((id * 2654435761) mod 2^32) mod n_buckets — SQL-expressible
    (fits BIGINT for ids < 2^32), uniform enough for splits."""
    h = (ids.astype(np.uint64) * KNUTH) & _M32
    return (h % np.uint64(n_buckets)).astype(np.int64)


def mix_bucket(ids: np.ndarray, n_buckets: int = 1000) -> np.ndarray:
    """splitmix64 bucket — the full-width flavor for 64-bit id spaces."""
    return (hashing.mix(ids.astype(np.uint64)) % np.uint64(n_buckets)).astype(
        np.int64
    )


def hash_split(
    ds: "ray.data.Dataset",
    id_col: str,
    fractions: dict[str, float],
    bucket_fn=mix_bucket,
    n_buckets: int = 1000,
) -> "ray.data.Dataset":
    """Add a ``split`` column: the id's hash bucket mapped through the
    cumulative fraction boundaries (insertion order of ``fractions``;
    fractions must sum to 1). Stateless per-batch projection."""
    names = list(fractions)
    bounds = np.cumsum([fractions[n] for n in names]) * n_buckets
    if not np.isclose(bounds[-1], n_buckets):
        raise ValueError("fractions must sum to 1")

    def fn(b: pd.DataFrame) -> pd.DataFrame:
        bucket = bucket_fn(b[id_col].to_numpy(), n_buckets)
        out = b.copy()
        out["split"] = np.asarray(names, dtype=object)[
            np.searchsorted(bounds, bucket, side="right")
        ]
        return out

    return ds.map_batches(fn, batch_format="pandas")


def stratified_sample(
    ds: "ray.data.Dataset",
    group_col: str,
    id_col: str,
    k: int,
    bucket_fn=mix_bucket,
) -> "ray.data.Dataset":
    """k rows per group, deterministic: order each group by
    (hash(id), id) and keep the first k via grouped_topk (range sort +
    run masking; edge runs pre-reduced to k rows per block)."""

    def add_hash(b: pd.DataFrame) -> pd.DataFrame:
        out = b.copy()
        out["_h"] = bucket_fn(b[id_col].to_numpy(), 2**32 - 1)
        return out

    sampled = topk.grouped_topk(
        ds.map_batches(add_hash, batch_format="pandas"),
        key_cols=[group_col],
        sort_cols=["_h", id_col],
        k=k,
        descending=False,
    )
    return sampled.map_batches(
        lambda b: b.drop(columns=["_h"]), batch_format="pandas"
    )


def rate_sample(
    ds: "ray.data.Dataset",
    id_col: str,
    group_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
    bucket_fn=knuth_bucket,
    n_buckets: int = 10000,
) -> "ray.data.Dataset":
    """Per-group deterministic rate sampling — the domain-mixture
    re-weighting step of a training-data pipeline (sample source A at
    100%, source B at 40%, ...). A row survives iff its id's hash
    bucket falls under ``int(rate * n_buckets)`` for its group's rate,
    so the sample is reproducible on any cluster shape and monotone in
    the rate (raising a rate only ADDS rows — stable incremental
    mixes). Stateless per-batch filter: no shuffle, nothing broadcast
    but the tiny rate table."""
    thresholds = {g: int(r * n_buckets) for g, r in rates.items()}
    default_thr = int(default_rate * n_buckets)

    def fn(b: pd.DataFrame) -> pd.DataFrame:
        bucket = bucket_fn(b[id_col].to_numpy(), n_buckets)
        thr = (
            b[group_col]
            .map(thresholds)
            .fillna(default_thr)
            .to_numpy(dtype=np.int64)
        )
        return b[bucket < thr]

    return ds.map_batches(fn, batch_format="pandas")


def epoch_shuffle(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    n_shards: int = 8,
    epoch: int = 0,
) -> "ray.data.Dataset":
    """(id, shard, pos): deterministic per-epoch training order — each
    example hashes to a read shard and a 1-based position within it;
    changing ``epoch`` re-permutes both, so every epoch sees a
    different but REPRODUCIBLE order on any cluster shape (the
    distributed stand-in for an in-memory epoch shuffle; readers
    consume shard s in pos order). Knuth multiplicative hash with an
    epoch salt — SQL-replayable in BIGINT for ids < 2^31 (the
    driver-gate flavor; use hashing.mix for full 64-bit id spaces).
    Cost: one range sort (inside grouped_rank), no other shuffle."""
    from . import rank as rankmod

    def hashes(b: pd.DataFrame) -> pd.DataFrame:
        ids = b[id_col].to_numpy()
        h = ((ids.astype(np.uint64) + np.uint64(epoch) * np.uint64(40503)) * KNUTH) & _M32
        return pd.DataFrame(
            {
                id_col: ids,
                "shard": (h % np.uint64(n_shards)).astype(np.int64),
                "h": h.astype(np.int64),
            }
        )

    rows = ds.map_batches(hashes, batch_format="pandas")
    ranked = rankmod.grouped_rank(rows, ["shard"], ["h", id_col], rank_col="pos")
    return ranked.map_batches(
        lambda b: b[[id_col, "shard", "pos"]], batch_format="pandas"
    )


def weighted_sample(
    ds: "ray.data.Dataset",
    id_col: str,
    weight_col: str,
    k: int,
) -> "ray.data.Dataset":
    """Weighted sampling WITHOUT replacement via the Efraimidis-
    Spirakis A-Res order statistic (Inf. Proc. Letters 97(5), 2006):
    each row draws key = -ln(u) / w and the k SMALLEST keys win —
    P(selection) proportional to weight, exactly, in one pass.

    The uniform u is derandomized through the knuth hash of the id
    ((id * 2654435761) mod 2^32 + 0.5) / 2^32, so the sample is a pure
    function of the table (reproducible on any cluster shape) and the
    whole operator replays in SQL as ORDER BY -ln(u)/w LIMIT k.
    Rows with weight <= 0 are never sampled (standard A-Res domain).
    Per-block partial top-k + tiny driver merge — no global sort.

    Returns (id_col, weight_col, es_key) for the k winners, es_key
    rounded to 6 dp."""

    def keyed(b: pd.DataFrame) -> pd.DataFrame:
        w = b[weight_col].to_numpy(dtype=np.float64)
        keep = w > 0
        ids = b[id_col].to_numpy()[keep]
        h = (ids.astype(np.uint64) * KNUTH) & _M32
        u = (h.astype(np.float64) + 0.5) / float(2**32)
        return pd.DataFrame(
            {
                id_col: ids,
                weight_col: w[keep],
                "es_key": -np.log(u) / w[keep],
            }
        )

    sample = topk.topk(
        ds.map_batches(keyed, batch_format="pandas"),
        sort_cols=["es_key", id_col],
        k=k,
        descending=[False, False],
    )

    def final(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["es_key"] = b["es_key"].round(6)
        return b

    return sample.map_batches(final, batch_format="pandas")
