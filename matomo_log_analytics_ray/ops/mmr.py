"""Maximal Marginal Relevance (MMR) diversity selection.

Selects k items that are RELEVANT to a query vector but mutually
DIVERSE — the standard re-ranking step for retrieval-augmented /
curation pipelines (Carbonell & Goldstein 1998):

    MMR(v) = lam * cos(q, v) - (1 - lam) * max_{s in S} cos(v, s)

Greedy argmax is inherently sequential in k, so the scalable shape is
the two-stage composition every production system uses:

1. distributed exact top-M prefilter by query cosine (per-batch
   partial top-k against the broadcast query, O(blocks x M) partial
   rows to the driver — ops/similarity.brute_force_topk), then
2. greedy MMR over the M candidates driver-side (numpy, O(M k d) —
   M is a constant like 200, never corpus-scale).

The selection is deterministic: prefilter ties break by ascending id
(same as the SQL oracle contract of similarity_topk), greedy ties by
ascending id.  Not SQL-expressible (iterative argmax over a growing
set), so the gate is rows-only; tests pin the exact selection against
an independent numpy reference.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data

from .similarity import _normalize, brute_force_topk


def greedy_mmr(
    ids: np.ndarray,
    vectors: np.ndarray,
    relevance: np.ndarray,
    k: int,
    lam: float,
) -> pd.DataFrame:
    """Greedy MMR over an in-memory candidate set (rows normalized).
    Returns (rank, id, mmr_score, relevance) for the k picks."""
    n = len(ids)
    k = min(k, n)
    # stable order: ids ascending within equal scores
    order = np.lexsort((ids,))
    max_sim = np.zeros(n)
    picked = np.zeros(n, dtype=bool)
    out = []
    for r in range(k):
        score = lam * relevance - (1.0 - lam) * max_sim
        score[picked] = -np.inf
        # argmax with ascending-id tie-break: scan in id order
        best = order[np.argmax(score[order])]
        # np.argmax returns the FIRST max along the scanned order,
        # which is the smallest id among ties because `order` is
        # id-ascending
        out.append((r, ids[best], float(score[best]), float(relevance[best])))
        picked[best] = True
        sim = vectors @ vectors[best]
        max_sim = np.maximum(max_sim, sim)
    return pd.DataFrame(out, columns=["rank", "vec_id", "mmr_score", "relevance"])


def mmr_select(
    corpus: "ray.data.Dataset",
    query_vector: np.ndarray,
    k: int = 20,
    lam: float = 0.7,
    prefilter_m: int = 200,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """Two-stage distributed MMR: exact cosine top-``prefilter_m``
    prefilter (distributed), then greedy MMR over the M candidates.
    Returns (rank, vec_id, mmr_score, relevance), k rows."""
    q = np.asarray(query_vector, dtype=np.float64)
    top = brute_force_topk(
        corpus, np.array([0]), q[None, :], k=prefilter_m,
        id_col=id_col, vec_col=vec_col,
    )
    ids = top[id_col].to_numpy()
    id_set = np.sort(ids)
    ref = ray.put(id_set)

    def pick(b: pd.DataFrame) -> pd.DataFrame:
        keys = ray.get(ref)
        v = b[id_col].to_numpy()
        pos = np.minimum(np.searchsorted(keys, v), len(keys) - 1)
        return b[keys[pos] == v][[id_col, vec_col]]

    cand = corpus.map_batches(pick, batch_format="pandas").to_pandas()
    V = _normalize(np.stack(cand[vec_col].to_numpy()).astype(np.float64))
    qn = q / max(np.linalg.norm(q), 1e-12)
    rel = V @ qn
    return greedy_mmr(
        cand[id_col].to_numpy(), V, rel, k, lam
    ).rename(columns={"vec_id": id_col})
