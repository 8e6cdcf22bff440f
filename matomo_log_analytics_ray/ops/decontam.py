"""Benchmark decontamination: flag training documents that share
k-gram shingles with an evaluation/benchmark set.

The standard pre-training hygiene step (the n-gram-overlap
decontamination used by published LLM data pipelines): any training
document containing a shingle that also occurs in the benchmark set is
flagged (with the count of distinct overlapping shingles) so it can be
dropped or audited before training.

Shape: the benchmark side is an EVAL set — small by definition — so
its distinct shingle-hash set is collected once and broadcast via
ray.put (a 1M-shingle benchmark is 8 MB); the training corpus streams
through a stateless vectorized map_batches (tokenize -> shingle ->
searchsorted membership -> per-doc distinct-overlap count). No
shuffle, no join: the corpus never moves. Shingling is
ops/hashing.shingle_hashes — identical semantics to the minhash/LSH
dedup family (docs shorter than k fall back to their word set), so
the gate's SQL oracle reuses the same gram construction.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data

from . import hashing


def benchmark_shingles(
    bench: "ray.data.Dataset", text_col: str = "text", k: int = 3
) -> np.ndarray:
    """Sorted distinct shingle hashes of the benchmark set (collected
    to the driver — eval sets are small; the per-block partial is
    already deduped so only distinct hashes move)."""
    def part(b: pd.DataFrame) -> pd.DataFrame:
        wh, off = hashing.tokenize_words(b[text_col])
        sh, _ = hashing.shingle_hashes(wh, off, k=k)
        return pd.DataFrame({"g": np.unique(sh)})

    parts = bench.map_batches(part, batch_format="pandas").to_pandas()
    if len(parts) == 0:
        return np.empty(0, dtype=np.uint64)
    return np.unique(parts["g"].to_numpy(dtype=np.uint64))


def decontaminate(
    train: "ray.data.Dataset",
    bench: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> "ray.data.Dataset":
    """(id, n_overlap, contaminated) per training doc: the number of
    its distinct k-gram shingles that occur anywhere in the benchmark
    set, and the drop flag."""
    grams = benchmark_shingles(bench, text_col=text_col, k=k)
    ref = ray.put(grams)

    def flag(b: pd.DataFrame) -> pd.DataFrame:
        arr = ray.get(ref)
        wh, off = hashing.tokenize_words(b[text_col])
        sh, soff = hashing.shingle_hashes(wh, off, k=k)
        n = len(b)
        n_overlap = np.zeros(n, dtype=np.int64)
        if len(sh) and len(arr):
            doc_of = np.repeat(np.arange(n), np.diff(soff))
            # distinct shingles per doc (shingle_hashes can repeat a
            # gram within a doc; the oracle counts distinct grams) via
            # one lexsort + adjacent-difference mask — the house
            # pattern; np.unique(axis=0) would copy and void-sort a
            # 2-column matrix on this corpus-streaming hot loop
            order = np.lexsort((sh, doc_of))
            ds_, ss_ = doc_of[order], sh[order]
            first = np.ones(len(ss_), dtype=bool)
            first[1:] = (ss_[1:] != ss_[:-1]) | (ds_[1:] != ds_[:-1])
            ud, ug = ds_[first], ss_[first]
            pos = np.searchsorted(arr, ug)
            pos = np.minimum(pos, len(arr) - 1)
            hit = arr[pos] == ug
            np.add.at(n_overlap, ud, hit.astype(np.int64))
        return pd.DataFrame(
            {
                id_col: b[id_col].to_numpy(),
                "n_overlap": n_overlap,
                "contaminated": n_overlap > 0,
            }
        )

    return train.map_batches(flag, batch_format="pandas")
