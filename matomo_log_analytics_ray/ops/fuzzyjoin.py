"""Fuzzy string self-join (entity resolution): pairs of records whose
texts are within a small edit distance, found by blocking + verify —
the classic ER pipeline shape (block on a cheap key, verify the
quadratic predicate only inside blocks).

Stages:

1. blocking — each record keyed by the uint64 hash of its first
   ``prefix_words`` words (a fixed-width projection; the text itself
   never enters the blocking shuffle); candidate (id_a < id_b) pairs
   inside each block come from the skew-valved in-block pair kernel
   (``ops/dedup.bucket_pairs``);
2. text attachment — two hash-partitioned joins against Arrow-typed
   (id, text) projections (``ops/dedup._attach_side``);
3. verify — banded Levenshtein with early exit, O(len x max_dist) per
   pair instead of O(len^2) (Ukkonen band): a candidate whose length
   difference already exceeds ``max_dist`` never touches the DP.

The verify loop is per-pair Python over the CANDIDATE set (bounded by
blocking, same cost class as ngram_jaccard_verify's per-pair set
intersections) — never over the corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from . import default_join_partitions
from .dedup import (
    _attach_side,
    arrow_col_type,
    arrow_col_type_or,
    bucket_pairs,
    normalize_pair_ids,
)
from .hashing import hash_strings


def banded_levenshtein(a: str, b: str, k: int) -> int:
    """Levenshtein distance if <= k, else k + 1 (early exit). Band of
    width 2k+1 around the diagonal — O(len(a) * k) time/memory."""
    la, lb = len(a), len(b)
    if abs(la - lb) > k:
        return k + 1
    if la == 0 or lb == 0:
        return max(la, lb)
    # ensure b is the longer string so the band stays valid
    if la > lb:
        a, b, la, lb = b, a, lb, la
    big = k + 1
    prev = {j: j for j in range(0, min(lb, k) + 1)}
    for i in range(1, la + 1):
        lo = max(1, i - k)
        hi = min(lb, i + k)
        cur = {}
        if lo - 1 >= i - k:
            cur[lo - 1] = prev.get(lo - 1, big) + 1 if lo - 1 >= 0 else big
        if i - k <= 0:
            cur[0] = i
        best = big
        ai = a[i - 1]
        for j in range(lo, hi + 1):
            c = min(
                prev.get(j, big) + 1,  # deletion
                cur.get(j - 1, big) + 1,  # insertion
                prev.get(j - 1, big) + (0 if ai == b[j - 1] else 1),
            )
            cur[j] = c
            if c < best:
                best = c
        if best > k:
            return big
        prev = cur
    return min(prev.get(lb, big), big)


def fuzzy_pairs(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    max_dist: int = 5,
    prefix_words: int = 2,
    max_bucket: int = 4096,
) -> "ray.data.Dataset":
    """(id_a, id_b, dist): candidate pairs sharing a ``prefix_words``-
    word prefix whose texts are within ``max_dist`` edits.
    ``max_bucket`` is the blocking skew valve (documented truncation
    above it, as in minhash_lsh_candidates)."""
    np_join = default_join_partitions()

    def block_key(b: pd.DataFrame) -> pd.DataFrame:
        # NULL convention shared with the oracle: text is
        # coalesce(text, '') on BOTH sides.  The prefix is padded to
        # exactly ``prefix_words`` tokens ('' for missing words), so a
        # 1-word doc blocks as 'hello ' — the same key SQL's
        # split_part(...,1) || ' ' || split_part(...,2) produces.
        words = b[text_col].fillna("").str.split(" ")
        nw = words.str.len().to_numpy(dtype=np.int64)
        pfx = words.str[:prefix_words].str.join(" ").to_numpy(dtype=object)
        missing = np.maximum(prefix_words - nw, 0)
        for m in range(1, prefix_words):
            pad = missing >= m
            if pad.any():
                pfx[pad] = pfx[pad] + " "
        return pd.DataFrame(
            {
                "k": hash_strings(pd.Series(pfx, dtype=object)),
                id_col: b[id_col].to_numpy(),
            }
        )

    rows = ds.map_batches(block_key, batch_format="pandas")
    cand = bucket_pairs(rows, ["k"], id_col, max_bucket=max_bucket)
    import pyarrow as pa

    id_t = arrow_col_type(ds, id_col)
    # materialized: count() short-circuits the no-candidates case (a
    # fully-empty join side yields schema-less blocks pyarrow rejects)
    # and the verify join reuses the same execution
    cand = normalize_pair_ids(cand, id_t, np_join).materialize()
    if cand.count() == 0:
        return ray.data.from_pandas(
            pd.DataFrame(
                {
                    "id_a": pd.Series([], dtype="int64"),
                    "id_b": pd.Series([], dtype="int64"),
                    "dist": pd.Series([], dtype="int64"),
                }
            )
        )
    # pandas-block inputs report object dtype for text; pin large_string
    txt_t = arrow_col_type_or(ds, text_col, pa.large_string())
    ta = _attach_side(ds, id_col, text_col, "id_a", "text_a", payload_type=txt_t)
    tb = _attach_side(ds, id_col, text_col, "id_b", "text_b", payload_type=txt_t)
    j = cand.join(ta, "inner", num_partitions=np_join, on=("id_a",))
    j = j.join(tb, "inner", num_partitions=np_join, on=("id_b",))

    def verify(b: pd.DataFrame) -> pd.DataFrame:
        dists = np.fromiter(
            (
                banded_levenshtein(x or "", y or "", max_dist)
                for x, y in zip(b["text_a"], b["text_b"])
            ),
            dtype=np.int64,
            count=len(b),
        )
        keep = dists <= max_dist
        return pd.DataFrame(
            {
                "id_a": b["id_a"].to_numpy()[keep],
                "id_b": b["id_b"].to_numpy()[keep],
                "dist": dists[keep],
            }
        )

    return j.map_batches(verify, batch_format="pandas")
