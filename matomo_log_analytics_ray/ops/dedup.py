"""Deduplication operators over a (id, text) document table.

Five families, each shaped for 100 TB operation:

* exact          content-hash partition + per-group min-id (one shuffle
                 over (hash, id) pairs only — text never moves)
* minhash_lsh    shingle -> 64-perm minhash -> banded LSH buckets ->
                 candidate pairs -> signature-estimated Jaccard verify
* simhash        64-bit sign-sum fingerprint; near-dup = bucketed by
                 16-bit chunks (Hamming<=3 guarantees a matching chunk)
* ngram_jaccard  exact Jaccard verification of candidate pairs (the
                 precise re-check stage after any LSH family)
* embedding near-dup lives in ops/similarity.py (cosine >= threshold)

Everything before the groupby is a vectorized map_batches kernel
(numpy/pandas; no per-row Python in the hot path); the shuffles move
only (key, id) or (band, hash, id) projections, never document text.
The reference has no dedup beyond insert-if-absent on file paths
(/root/reference/libs/lib_database.py:73-94, SURVEY.md D1); these
operators generalize that to content identity for training-data scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data
from ray.data.aggregate import Count, Min

from . import hashing

MINHASH_PERMS = 64
LSH_BANDS = 16  # 16 bands x 4 rows
SIMHASH_CHUNKS = 4  # 4 x 16-bit chunks -> catches Hamming distance <= 3

_rng = np.random.default_rng(0xC0FFEE)
_MINHASH_A = _rng.integers(1, 2**63 - 1, size=MINHASH_PERMS, dtype=np.uint64) | np.uint64(1)
_MINHASH_B = _rng.integers(0, 2**63 - 1, size=MINHASH_PERMS, dtype=np.uint64)
_BAND_MIX = _rng.integers(1, 2**63 - 1, size=MINHASH_PERMS // LSH_BANDS, dtype=np.uint64) | np.uint64(1)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def _content_hash_batch(id_col: str, text_col: str, normalize=None):
    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        text = batch[text_col]
        if normalize is not None:
            text = normalize(text)
        return pd.DataFrame(
            {
                "content_hash": hashing.mix(hashing.hash_strings(text)),
                id_col: batch[id_col].to_numpy(),
            }
        )

    return fn


def first_token_key(text: pd.Series) -> pd.Series:
    """Normalizer for key-based exact dedup: the document's first
    whitespace token (a cheap stand-in for a canonicalized content key
    when full texts are unique — e.g. URL-less boilerplate grouping)."""
    return text.str.split(" ", n=1).str[0]


def exact_dedup_keep_ids(
    docs: "ray.data.Dataset", id_col: str = "doc_id", text_col: str = "text"
) -> "ray.data.Dataset":
    """One kept id per distinct text: hash-partition on the content
    hash, keep min(id) per group. Only (hash, id) pairs shuffle."""
    return (
        docs.map_batches(_content_hash_batch(id_col, text_col), batch_format="pandas")
        .groupby("content_hash")
        .aggregate(Min(id_col, alias_name=id_col))
        .select_columns([id_col])
    )


def exact_dup_groups(
    docs: "ray.data.Dataset", id_col: str = "doc_id", text_col: str = "text", normalize=None
) -> "ray.data.Dataset":
    """(content_hash, n_dups) for groups with more than one member.

    `normalize` optionally canonicalizes text before hashing (e.g.
    `first_token_key`) so near-boilerplate groups collapse."""
    counts = (
        docs.map_batches(_content_hash_batch(id_col, text_col, normalize), batch_format="pandas")
        .groupby("content_hash")
        .aggregate(Count(alias_name="n_dups"))
    )

    def only_dups(b: pd.DataFrame) -> pd.DataFrame:
        return b[b["n_dups"] > 1]

    return counts.map_batches(only_dups, batch_format="pandas")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signature_batch(
    batch: pd.DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3
) -> pd.DataFrame:
    """One row per doc: id + the 64 minhash values as a fixed-size list.

    Vectorized: per permutation j, sig_j(doc) = min over the doc's
    shingles of (a_j * shingle + b_j) — computed with one
    minimum.reduceat over the flat shingle array per permutation.
    """
    wh, off = hashing.tokenize_words(batch[text_col])
    sh, soff = hashing.shingle_hashes(wh, off, k=k)
    n_docs = len(batch)
    sig = np.full((n_docs, MINHASH_PERMS), np.iinfo(np.uint64).max, dtype=np.uint64)
    nonempty = np.diff(soff) > 0
    starts = soff[:-1][nonempty]
    if len(sh):
        for j in range(MINHASH_PERMS):
            hj = _MINHASH_A[j] * sh + _MINHASH_B[j]
            sig[nonempty, j] = np.minimum.reduceat(hj, starts)
    return pd.DataFrame({id_col: batch[id_col].to_numpy(), "signature": list(sig)})


def _band_rows(id_col: str):
    rows_per_band = MINHASH_PERMS // LSH_BANDS

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        sig = np.stack(batch["signature"].to_numpy())  # (docs, 64)
        ids = batch[id_col].to_numpy()
        n = len(ids)
        bands = sig.reshape(n, LSH_BANDS, rows_per_band).astype(np.uint64)
        bh = np.zeros((n, LSH_BANDS), dtype=np.uint64)
        for i in range(rows_per_band):
            bh = hashing.mix(bh + _BAND_MIX[i] * bands[:, :, i])
        return pd.DataFrame(
            {
                "band": np.tile(np.arange(LSH_BANDS, dtype=np.int32), n),
                "band_hash": bh.reshape(-1),
                id_col: np.repeat(ids, LSH_BANDS),
            }
        )

    return fn


def _pairs_from_bucket(id_col: str, max_bucket: int = 64):
    def fn(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(g[id_col].to_numpy())
        if len(ids) < 2:
            return pd.DataFrame({"id_a": [], "id_b": []})
        ids = ids[:max_bucket]  # cap pathological buckets; logged via metrics
        a, b = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"id_a": ids[a], "id_b": ids[b]})

    return fn


def minhash_lsh_candidates(
    docs: "ray.data.Dataset", id_col: str = "doc_id", text_col: str = "text", k: int = 3
) -> "ray.data.Dataset":
    """Candidate near-dup pairs (id_a < id_b), deduplicated across bands."""
    sigs = docs.map_batches(
        lambda b: minhash_signature_batch(b, id_col, text_col, k),
        batch_format="pandas",
    )
    pairs = (
        sigs.map_batches(_band_rows(id_col), batch_format="pandas")
        .groupby(["band", "band_hash"])
        .map_groups(_pairs_from_bucket(id_col), batch_format="pandas")
    )
    # a pair can surface from several bands -> distinct
    return pairs.groupby(["id_a", "id_b"]).aggregate(Count(alias_name="n_bands"))


def estimate_jaccard_pairs(
    pairs_df: pd.DataFrame, signatures_df: pd.DataFrame, id_col: str = "doc_id"
) -> pd.DataFrame:
    """Signature-estimated Jaccard per candidate pair (driver-side; the
    candidate set is small relative to the corpus by construction)."""
    sig_by_id = dict(
        zip(signatures_df[id_col].to_numpy(), signatures_df["signature"].to_numpy())
    )
    est = [
        float(np.mean(np.asarray(sig_by_id[a]) == np.asarray(sig_by_id[b])))
        for a, b in zip(pairs_df["id_a"], pairs_df["id_b"])
    ]
    out = pairs_df.copy()
    out["est_jaccard"] = est
    return out


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_batch(
    batch: pd.DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> pd.DataFrame:
    """64-bit simhash per doc: sign of the per-bit sum of word hashes."""
    wh, off = hashing.tokenize_words(batch[text_col])
    n_docs = len(batch)
    fp = np.zeros(n_docs, dtype=np.uint64)
    if len(wh):
        bits = ((wh[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(
            np.int64
        ) * 2 - 1  # (words, 64) in {-1, +1}
        starts = off[:-1].copy()
        # reduceat needs strictly valid starts; empty docs handled after
        nonempty = np.diff(off) > 0
        sums = np.zeros((n_docs, 64), dtype=np.int64)
        if nonempty.any():
            red = np.add.reduceat(bits, off[:-1][nonempty])
            sums[nonempty] = red
        pos = (sums > 0).astype(np.uint64)
        fp = (pos << np.arange(64, dtype=np.uint64)).sum(axis=1, dtype=np.uint64)
    return pd.DataFrame({id_col: batch[id_col].to_numpy(), "simhash": fp})


def simhash_candidates(
    docs: "ray.data.Dataset", id_col: str = "doc_id", text_col: str = "text"
) -> "ray.data.Dataset":
    """Candidate pairs bucketed by 16-bit fingerprint chunks (any pair
    within Hamming distance 3 shares at least one of the 4 chunks)."""
    fps = docs.map_batches(
        lambda b: simhash_batch(b, id_col, text_col), batch_format="pandas"
    )

    def chunk_rows(b: pd.DataFrame) -> pd.DataFrame:
        fp = b["simhash"].to_numpy(dtype=np.uint64)
        ids = b[id_col].to_numpy()
        n = len(ids)
        chunks = np.stack(
            [(fp >> np.uint64(16 * c)) & np.uint64(0xFFFF) for c in range(SIMHASH_CHUNKS)],
            axis=1,
        )
        return pd.DataFrame(
            {
                "chunk": np.tile(np.arange(SIMHASH_CHUNKS, dtype=np.int32), n),
                "chunk_val": chunks.reshape(-1),
                id_col: np.repeat(ids, SIMHASH_CHUNKS),
            }
        )

    pairs = (
        fps.map_batches(chunk_rows, batch_format="pandas")
        .groupby(["chunk", "chunk_val"])
        .map_groups(_pairs_from_bucket(id_col), batch_format="pandas")
    )
    return pairs.groupby(["id_a", "id_b"]).aggregate(Count(alias_name="n_chunks"))


def hamming_distance(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = np.bitwise_xor(a.astype(np.uint64), b.astype(np.uint64))
    return np.array(
        [bin(int(v)).count("1") for v in x], dtype=np.int64
    )  # candidate sets are small; fine driver-side


# ---------------------------------------------------------------------------
# exact n-gram Jaccard verification
# ---------------------------------------------------------------------------


def ngram_jaccard_verify(
    pairs_df: pd.DataFrame,
    docs_df: pd.DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.8,
) -> pd.DataFrame:
    """Exact k-gram Jaccard for candidate pairs (driver-side verify of
    the LSH output; at scale this runs inside map_groups on pair
    buckets co-partitioned with their texts)."""
    wh, off = hashing.tokenize_words(docs_df[text_col])
    sh, soff = hashing.shingle_hashes(wh, off, k=k)
    sets = {
        docs_df[id_col].iloc[i]: set(sh[soff[i] : soff[i + 1]].tolist())
        for i in range(len(docs_df))
    }
    jac = []
    for a, b in zip(pairs_df["id_a"], pairs_df["id_b"]):
        sa, sb = sets.get(a, set()), sets.get(b, set())
        union = len(sa | sb)
        jac.append(len(sa & sb) / union if union else 0.0)
    out = pairs_df.copy()
    out["jaccard"] = jac
    out["is_dup"] = out["jaccard"] >= threshold
    return out
