"""Deterministic vectorized hashing primitives shared by the dedup /
fingerprint operators.

All hashes are computed with numpy uint64 arithmetic over pandas'
deterministic string hash (fixed hash key), so results are stable
across processes and cluster nodes — a requirement for hash-partitioned
dedup (the same shingle must land in the same bucket on every node).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

# multiplicative mixing constants (splitmix64-style)
_MIX1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX2 = np.uint64(0x94D049BB133111EB)
_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def hash_strings(s: pd.Series) -> np.ndarray:
    """uint64 hash per string; vectorized, deterministic."""
    return pd.util.hash_pandas_object(s.astype(str), index=False).to_numpy(
        dtype=np.uint64
    )


def mix(h: np.ndarray) -> np.ndarray:
    h = (h ^ (h >> np.uint64(30))) * _MIX1
    h = (h ^ (h >> np.uint64(27))) * _MIX2
    return h ^ (h >> np.uint64(31))


def combine(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Order-sensitive combine of two hash vectors."""
    return mix(a * _GOLDEN + b)


def tokenize_words(texts: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """(word_hashes, doc_offsets): flat uint64 word hashes for all docs
    plus the start offset of each doc (len = n_docs + 1). Lowercased
    word tokens; fully vectorized via explode + one bulk hash."""
    words = texts.fillna("").str.lower().str.findall(r"[a-z0-9]+")
    counts = words.str.len().to_numpy(dtype=np.int64)
    offsets = np.zeros(len(counts) + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    flat = words.explode().dropna()
    hashes = (
        hash_strings(flat) if len(flat) else np.empty(0, dtype=np.uint64)
    )
    return hashes, offsets


def shingle_hashes(
    word_hashes: np.ndarray, offsets: np.ndarray, k: int = 3
) -> tuple[np.ndarray, np.ndarray]:
    """Hash every k-word shingle; docs shorter than k fall back to their
    word hashes (so no doc has an empty shingle set unless it has no
    words). Returns (flat shingle hashes, per-doc offsets)."""
    n_docs = len(offsets) - 1
    sh = word_hashes.copy()
    for i in range(1, k):
        nxt = np.roll(word_hashes, -i)
        sh = combine(sh, nxt)
    # valid shingle start positions: those with k-1 successors in-doc
    doc_of = np.repeat(np.arange(n_docs), np.diff(offsets))
    valid = np.ones(len(word_hashes), dtype=bool)
    if k > 1 and len(word_hashes):
        end_ok = np.arange(len(word_hashes)) + k - 1 < len(word_hashes)
        same_doc = np.zeros(len(word_hashes), dtype=bool)
        idx = np.arange(len(word_hashes))
        last = np.minimum(idx + k - 1, len(word_hashes) - 1)
        same_doc = doc_of[last] == doc_of
        valid = end_ok & same_doc

    counts = np.diff(offsets)
    short = counts < k  # per-doc fallback to unigrams
    keep = valid | short[doc_of] if len(word_hashes) else valid
    out = np.where(valid, sh, word_hashes)[keep] if len(word_hashes) else sh
    out_counts = np.bincount(doc_of[keep], minlength=n_docs) if len(word_hashes) else np.zeros(n_docs, dtype=np.int64)
    out_offsets = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(out_counts, out=out_offsets[1:])
    return out, out_offsets
