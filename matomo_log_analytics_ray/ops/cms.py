"""Count-min sketch: mergeable point-frequency estimation in one scan.

Completes the bounded-state sketch suite (ops/qsketch quantiles,
ops/distinct HLL cardinality, ops/heavyhitters Misra-Gries top keys,
ops/bloom membership) with the frequency axis: "about how many times
does key k appear?" over a stream too large to count exactly — the
building block behind approximate token/doc-frequency tables at corpus
scale, where an exact per-key groupby is an all-to-all shuffle of every
occurrence.

Shape (the same one-scan discipline as qsketch.summarize): each block
folds its keys into a local ``depth x width`` counter grid fully
vectorized (np.add.at per row); only the O(depth * width) grids leave
the workers, and the driver merge is element-wise SUM — associative and
commutative, so the sketch is invariant to block boundaries, row order
and cluster shape, and two corpora sketch-merge by addition (the
mergeability property the tests pin exactly).

Guarantees (standard CMS, Cormode & Muthukrishnan 2005):
* one-sided: estimate(k) >= true_count(k) always;
* per row the expected overshoot is N / w (N = stream size, w = width),
  so the overshoot exceeds 2N/w with probability <= 1/2 (Markov), and
  the min over d independent rows exceeds it with probability <= 2^-d.
  tests/test_cms.py pins est >= exact everywhere plus the 2N/w bound
  (at depth 4 a fixture-wide violation is a ~2^-40 event).

NULL convention: null keys are dropped before sketching (COUNT(key)
semantics, matching the exact-count oracle sibling per_key_counts).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data

from . import hashing

DEPTH = 4
WIDTH = 4096
# one odd splitmix64-derived salt per sketch row
_ROW_SALTS = tuple(
    np.uint64(s)
    for s in (
        0x9E3779B97F4A7C15,
        0xC2B2AE3D27D4EB4F,
        0x165667B19E3779F9,
        0x27D4EB2F165667C5,
        0x85EBCA77C2B2AE63,
        0xFF51AFD7ED558CCD,
        0xC4CEB9FE1A85EC53,
        0x2545F4914F6CDD1D,
    )
)


def _key_hashes(vals: pd.Series) -> np.ndarray:
    """uint64 hash per non-null key. Integer keys hash by VALUE;
    integral floats hash identically to the same integer (elementwise,
    so the identity holds regardless of batch composition — a float64
    column holding 1.0 and an int64 column holding 1 agree, which is
    what makes None-coerced integer query keys work); everything else
    hashes through the deterministic string hash."""
    vals = vals.dropna()
    if len(vals) == 0:
        return np.empty(0, dtype=np.uint64)
    if vals.dtype.kind in "iu":
        return hashing.mix(vals.to_numpy(dtype=np.uint64))
    if vals.dtype.kind == "f":
        v = vals.to_numpy()
        with np.errstate(invalid="ignore"):
            as_int = np.where(np.isfinite(v), v, 0).astype(np.int64)
        integral = np.isfinite(v) & (as_int == v)
        return np.where(
            integral,
            hashing.mix(as_int.astype(np.uint64)),
            hashing.hash_strings(vals.astype(str)),
        )
    return hashing.hash_strings(vals.astype(str))


def _fold(h: np.ndarray, depth: int, width: int) -> np.ndarray:
    """Fold a hash vector into a (depth, width) counter grid."""
    grid = np.zeros((depth, width), dtype=np.int64)
    for r in range(depth):
        cols = (hashing.mix(h ^ _ROW_SALTS[r]) % np.uint64(width)).astype(
            np.int64
        )
        np.add.at(grid[r], cols, 1)
    return grid


def cms_sketch(
    ds: "ray.data.Dataset",
    col: str,
    *,
    depth: int = DEPTH,
    width: int = WIDTH,
) -> np.ndarray:
    """ONE streaming pass -> the merged (depth, width) int64 grid.
    Per-block partials ride as raw bytes (one row per block); the
    driver merge is an element-wise sum over O(blocks) grids."""
    if not 1 <= depth <= len(_ROW_SALTS):
        raise ValueError(f"depth must be in [1, {len(_ROW_SALTS)}]")

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        grid = _fold(_key_hashes(b[col]), depth, width)
        return pd.DataFrame({"grid": [grid.tobytes()]})

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    grid = np.zeros((depth, width), dtype=np.int64)
    if "grid" not in parts.columns:  # empty input: the UDF never ran
        return grid
    for blob in parts["grid"]:
        grid += np.frombuffer(blob, dtype=np.int64).reshape(depth, width)
    return grid


def cms_estimate(
    grid: np.ndarray, keys: pd.Series | np.ndarray
) -> np.ndarray:
    """Point-frequency estimates (int64) for ``keys`` against a merged
    grid: min over the depth rows — never under the true count. The
    output is POSITIONALLY aligned with ``keys``: null keys estimate 0
    (the sketch never counted them). Integral floats hash identically
    to the same integers (see _key_hashes), so int queries against an
    int sketch survive pandas' int->float None-coercion; querying with
    a genuinely different value representation (e.g. stringified ints
    against an int sketch) still breaks the guarantee."""
    depth, width = grid.shape
    keys = pd.Series(keys).reset_index(drop=True)
    valid = keys.notna().to_numpy()
    h = _key_hashes(keys[valid])
    sub = np.full(int(valid.sum()), np.iinfo(np.int64).max, dtype=np.int64)
    for r in range(depth):
        cols = (hashing.mix(h ^ _ROW_SALTS[r]) % np.uint64(width)).astype(
            np.int64
        )
        sub = np.minimum(sub, grid[r, cols])
    est = np.zeros(len(keys), dtype=np.int64)
    est[valid] = sub
    return est


def cms_key_estimates(
    ds: "ray.data.Dataset",
    col: str,
    keys: pd.Series | np.ndarray | list,
    *,
    depth: int = DEPTH,
    width: int = WIDTH,
) -> pd.DataFrame:
    """Sketch ``ds[col]`` once and estimate the given keys:
    (key, est_count) — the driver-gate surface. ``keys`` is the small
    query side (bounded driver state), not the stream."""
    grid = cms_sketch(ds, col, depth=depth, width=width)
    keys = pd.Series(keys).dropna().drop_duplicates().reset_index(drop=True)
    return pd.DataFrame({col: keys, "est_count": cms_estimate(grid, keys)})
