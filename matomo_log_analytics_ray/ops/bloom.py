"""Bloom-filter semi-join prefilter.

The classic shuffle-volume cutter for large-large joins: build a Bloom
filter of the build side's join keys (per-block bit-array partials,
tree-merged in workers so the driver receives O(1) arrays — the
filter is O(bits), not O(keys)),
broadcast it once via ``ray.put``, and drop probe-side rows whose key
cannot be in the build side BEFORE they enter the join shuffle. False
positives only (tunable via bits-per-key), never false negatives — so
the exact join downstream still produces exactly the right rows; the
prefilter just stops provably-unmatchable rows from shuffling.

Hashing: k=4 independent splitmix64-derived probes per key,
deterministic across processes (ops/hashing constants), so a filter
built on any node tests identically on every other.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data

from . import hashing

BITS_PER_KEY = 16  # ~0.2% false-positive rate at k=4
N_PROBES = 4

_SEEDS = np.array(
    [0xA076_1D64_78BD_642F, 0xE703_7ED1_A0B4_28DB,
     0x8EBC_6AF0_9C88_C6E3, 0x5899_65CC_7537_4CC3],
    dtype=np.uint64,
)


def _probe_positions(keys: np.ndarray, m_bits: int) -> np.ndarray:
    """(n, k) bit positions for each key; deterministic."""
    h = keys.astype(np.uint64)
    return np.stack(
        [hashing.mix(h ^ _SEEDS[i]) % np.uint64(m_bits) for i in range(N_PROBES)],
        axis=1,
    )


def build_bloom(
    keys_ds: "ray.data.Dataset", key_col: str, n_keys_hint: int
) -> tuple["ray.ObjectRef", int]:
    """Build the filter distributed: each block sets its keys' bits in
    a local array; the driver ORs the partials (each m/8 bytes). Returns
    (object-store ref of the packed bit array, m_bits) — pass both to
    ``prefilter``. Size the filter with ``n_keys_hint`` (an overcount
    is fine, it only lowers the FP rate)."""
    m_bits = max(1024, int(n_keys_hint) * BITS_PER_KEY)
    n_bytes = (m_bits + 7) // 8

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        pos = _probe_positions(b[key_col].to_numpy(), m_bits).ravel()
        bits = np.zeros(n_bytes, dtype=np.uint8)
        np.bitwise_or.at(bits, pos // 8, (1 << (pos % 8)).astype(np.uint8))
        return pd.DataFrame({"bits": [bits.tobytes()]})

    def or_rows(b: pd.DataFrame) -> pd.DataFrame:
        acc = np.zeros(n_bytes, dtype=np.uint8)
        for blob in b["bits"]:
            acc |= np.frombuffer(blob, dtype=np.uint8)
        return pd.DataFrame({"bits": [acc.tobytes()]})

    # Worker-side tree merge: one m/8-byte partial per BLOCK would ship
    # blocks x m/8 bytes to the driver (a 2 GB filter x hundreds of
    # blocks overwhelms it). Fold the partials to <= _MERGE_FAN_IN rows
    # in workers first (repartition + OR-per-block), so the driver
    # receives O(1) arrays regardless of input block count.
    _MERGE_FAN_IN = 8
    parts = (
        keys_ds.map_batches(partial, batch_format="pandas")
        .repartition(_MERGE_FAN_IN)
        .map_batches(or_rows, batch_size=None, batch_format="pandas")
        .to_pandas()
    )
    merged = np.zeros(n_bytes, dtype=np.uint8)
    for blob in parts["bits"]:
        merged |= np.frombuffer(blob, dtype=np.uint8)
    return ray.put(merged), m_bits


def prefilter(
    ds: "ray.data.Dataset", key_col: str, bloom_ref: "ray.ObjectRef", m_bits: int
) -> "ray.data.Dataset":
    """Drop rows whose key is definitely absent from the filter. The
    packed array is read zero-copy from the object store once per task
    (broadcast), never re-shipped per batch."""

    class Filter:
        def __init__(self):
            self.bits = ray.get(bloom_ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            pos = _probe_positions(b[key_col].to_numpy(), m_bits)
            hit = np.ones(len(b), dtype=bool)
            for i in range(N_PROBES):
                p = pos[:, i]
                bit = (self.bits[p // 8] >> (p % 8).astype(np.uint8)) & 1
                hit &= bit.astype(bool)
            return b[hit]

    ncpus = max(2, int(ray.cluster_resources().get("CPU", 8)) // 2)
    return ds.map_batches(
        Filter, batch_format="pandas", concurrency=(1, ncpus)
    )
