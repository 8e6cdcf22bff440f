"""Similarity search over an embedding column (list<float>).

* brute_force_topk — the exact baseline: the (small) query matrix is
  broadcast once via ray.put; every batch does one numpy matmul against
  it and emits per-batch partial top-k rows; the global top-k is a
  final merge over (batches x k) partials. The corpus streams — only
  (query_id, vec_id, score) partials move.
* lsh_topk — the scale path: random-hyperplane signatures bucket the
  corpus (groupby signature); queries search only their bucket (and
  optionally neighboring buckets). Trades recall for touching only
  1/2^bits of the corpus per query.
* embedding_near_dup — cosine >= threshold near-duplicate pairs among
  the corpus itself via the same broadcast-matmul kernel.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
import ray

import ray.data

_rng = np.random.default_rng(0x5EED)


def _normalize(m: np.ndarray) -> np.ndarray:
    # float64 so scores agree with the DuckDB oracle to >= 6 decimals;
    # at very large scale a float32 variant halves the broadcast size
    m = np.asarray(m, dtype=np.float64)
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


class BruteForceScorer:
    """map_batches actor: broadcast query matrix fetched once per actor."""

    def __init__(self, queries_ref, k: int, id_col: str, vec_col: str):
        q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) else queries_ref
        self.query_ids = np.asarray(q["ids"])
        self.qmat = _normalize(np.stack(q["vectors"]))  # (nq, d)
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        vecs = _normalize(np.stack(batch[self.vec_col].to_numpy()))  # (n, d)
        ids = batch[self.id_col].to_numpy()
        scores = vecs @ self.qmat.T  # (n, nq)
        k = min(self.k, len(ids))
        # per-query partial top-k within this batch
        top = np.argpartition(-scores, k - 1, axis=0)[:k]  # (k, nq)
        out = {
            "query_id": np.repeat(self.query_ids, k),
            self.id_col: ids[top].T.reshape(-1),
            "score": np.take_along_axis(scores, top, axis=0).T.reshape(-1),
        }
        return pd.DataFrame(out)


def brute_force_topk(
    corpus: "ray.data.Dataset",
    query_ids: np.ndarray,
    query_vectors: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    concurrency: int | tuple = 2,
) -> pd.DataFrame:
    """Exact cosine top-k; returns (query_id, vec_id, score, rank)."""
    ref = ray.put({"ids": np.asarray(query_ids), "vectors": np.asarray(query_vectors)})
    partials = corpus.map_batches(
        BruteForceScorer,
        fn_constructor_kwargs={
            "queries_ref": ref,
            "k": k,
            "id_col": id_col,
            "vec_col": vec_col,
        },
        batch_format="pandas",
        concurrency=concurrency,
    ).to_pandas()  # (n_batches x k x nq) rows — small

    out = []
    for qid, g in partials.groupby("query_id"):
        best = heapq.nlargest(k, g.itertuples(index=False), key=lambda r: r.score)
        for rank, r in enumerate(best):
            out.append((qid, getattr(r, id_col), float(r.score), rank))
    return pd.DataFrame(out, columns=["query_id", id_col, "score", "rank"])


def signature_bits(vectors: np.ndarray, n_bits: int = 8, dim: int | None = None) -> np.ndarray:
    """Random-hyperplane LSH signature (deterministic planes)."""
    vectors = np.asarray(vectors, dtype=np.float32)
    planes = np.random.default_rng(0x5EED).standard_normal(
        (vectors.shape[1] if dim is None else dim, n_bits)
    ).astype(np.float32)
    bits = (vectors @ planes) > 0
    weights = (1 << np.arange(n_bits)).astype(np.int64)
    return bits @ weights


def lsh_topk(
    corpus: "ray.data.Dataset",
    query_ids: np.ndarray,
    query_vectors: np.ndarray,
    k: int = 10,
    n_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """Approximate top-k: corpus rows hashed into 2^n_bits buckets; each
    query scores only its own bucket. Partitioning assumption: bucket
    skew is bounded because hyperplane signs of roughly-isotropic
    embeddings are near-uniform; pathological skew needs more bits."""
    qsig = signature_bits(np.asarray(query_vectors), n_bits)
    wanted = set(qsig.tolist())

    def bucket_filter(batch: pd.DataFrame) -> pd.DataFrame:
        vecs = np.stack(batch[vec_col].to_numpy())
        sig = signature_bits(vecs, n_bits)
        keep = np.isin(sig, list(wanted))
        out = batch.loc[keep, [id_col, vec_col]].copy()
        out["bucket"] = sig[keep]
        return out

    candidates = corpus.map_batches(bucket_filter, batch_format="pandas").to_pandas()
    out = []
    for qid, qvec, sig in zip(query_ids, np.asarray(query_vectors), qsig):
        sub = candidates[candidates["bucket"] == sig]
        if sub.empty:
            continue
        mat = _normalize(np.stack(sub[vec_col].to_numpy()))
        qn = _normalize(qvec[None, :])[0]
        scores = mat @ qn
        top = np.argsort(-scores)[:k]
        for rank, i in enumerate(top):
            out.append((qid, sub[id_col].iloc[i], float(scores[i]), rank))
    return pd.DataFrame(out, columns=["query_id", id_col, "score", "rank"])


def kmeans_centroids(
    sample: np.ndarray, nlist: int = 16, iters: int = 8, seed: int = 0x5EED
) -> np.ndarray:
    """Deterministic Lloyd k-means on a driver-side sample (spherical:
    centroids re-normalized each round, assignment by max dot product).
    The sample is small (<= ~64k rows); the heavy assignment of the full
    corpus happens distributed in ivf_topk."""
    sample = _normalize(sample)
    rng = np.random.default_rng(seed)
    cent = sample[rng.choice(len(sample), size=min(nlist, len(sample)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(sample @ cent.T, axis=1)
        for c in range(len(cent)):
            members = sample[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _normalize(cent)
    return cent


def ivf_topk(
    corpus: "ray.data.Dataset",
    query_ids: np.ndarray,
    query_vectors: np.ndarray,
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    train_n: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """IVF approximate top-k — the classic scale path for ANN:

    1. train: k-means centroids on a driver-side sample (limit train_n);
    2. probe: each query selects its nprobe nearest centroids;
    3. scan: one distributed map_batches pass assigns every corpus row
       to its nearest centroid and keeps ONLY rows landing in a probed
       list (the broadcast is just the (nlist, d) centroid matrix);
    4. score: surviving candidates (a 1/nlist*nprobe fraction of the
       corpus in expectation) are scored per query driver-side.

    Partitioning assumption: inverted lists are roughly balanced; a
    pathologically clustered corpus needs more lists (bigger nlist)
    exactly as in FAISS-style IVF."""
    train = np.stack(
        corpus.limit(train_n).to_pandas()[vec_col].to_numpy()
    )
    cent = kmeans_centroids(train, nlist=nlist)
    qmat = _normalize(np.asarray(query_vectors))
    # (nq, nprobe) probed list ids per query
    probed = np.argsort(-(qmat @ cent.T), axis=1)[:, :nprobe]
    wanted = np.unique(probed)
    cent_ref = ray.put(cent)
    wanted_set = set(wanted.tolist())

    def assign_filter(batch: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(cent_ref)
        vecs = _normalize(np.stack(batch[vec_col].to_numpy()))
        lists = np.argmax(vecs @ c.T, axis=1)
        keep = np.isin(lists, list(wanted_set))
        out = batch.loc[keep, [id_col, vec_col]].copy()
        out["ivf_list"] = lists[keep]
        return out

    candidates = corpus.map_batches(assign_filter, batch_format="pandas").to_pandas()
    out = []
    for qi, (qid, qvec) in enumerate(zip(query_ids, qmat)):
        sub = candidates[candidates["ivf_list"].isin(probed[qi])]
        if sub.empty:
            continue
        mat = _normalize(np.stack(sub[vec_col].to_numpy()))
        scores = mat @ qvec
        top = np.argsort(-scores)[: min(k, len(scores))]
        for rank, i in enumerate(top):
            out.append((qid, sub[id_col].iloc[i], float(scores[i]), rank))
    return pd.DataFrame(out, columns=["query_id", id_col, "score", "rank"])


def embedding_near_dup_bucketed(
    corpus: "ray.data.Dataset",
    threshold: float = 0.95,
    n_bands: int = 8,
    band_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """Distributed near-dup: the scale path that never broadcasts the
    corpus. Each row is hashed into ``n_bands`` independent
    random-hyperplane signatures; rows sharing any (band, signature)
    bucket are candidates, verified with exact cosine inside
    groupby(bucket).map_groups, then deduplicated across bands.

    Recall: a pair at cosine >= t agrees on one hyperplane sign with
    probability 1 - acos(t)/pi (~0.9 at t=0.95), so P(pair shares at
    least one of 8 8-bit band signatures) ~ 1-(1-0.9^8)^8 ~ 0.98.
    Partitioning assumption: bucket sizes stay bounded for roughly
    isotropic embeddings; raise band_bits if a bucket grows hot.
    """

    def band_rows(batch: pd.DataFrame) -> pd.DataFrame:
        vecs = _normalize(np.stack(batch[vec_col].to_numpy()))
        ids = batch[id_col].to_numpy()
        frames = []
        for band in range(n_bands):
            planes = np.random.default_rng(0xBEEF + band).standard_normal(
                (vecs.shape[1], band_bits)
            )
            bits = (vecs @ planes) > 0
            sig = bits @ (1 << np.arange(band_bits)).astype(np.int64)
            frames.append(
                pd.DataFrame({"band": band, "sig": sig, id_col: ids, "vec": list(vecs)})
            )
        return pd.concat(frames, ignore_index=True)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
        mat = np.stack(g["vec"].to_numpy())
        ids = g[id_col].to_numpy()
        scores = mat @ mat.T
        ia, ib = np.where(np.triu(scores >= threshold, k=1))
        a, b_ = ids[ia], ids[ib]
        swap = a > b_
        a2 = np.where(swap, b_, a)
        b2 = np.where(swap, a, b_)
        keep = a2 != b2
        return pd.DataFrame(
            {"id_a": a2[keep], "id_b": b2[keep], "cosine": scores[ia, ib][keep]}
        )

    pairs = (
        corpus.map_batches(band_rows, batch_format="pandas")
        .groupby(["band", "sig"])
        .map_groups(bucket_pairs, batch_format="pandas")
        .to_pandas()
    )
    return (
        pairs.drop_duplicates(subset=["id_a", "id_b"])
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )


def embedding_near_dup(
    corpus: "ray.data.Dataset",
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """Cosine-threshold near-dup pairs: stream batches against the
    broadcast (normalized) corpus matrix. The broadcast side must fit a
    worker's memory — for corpora beyond that, pre-bucket with
    signature_bits and run per-bucket (documented scale path)."""
    all_rows = corpus.select_columns([id_col, vec_col]).to_pandas()
    ids = all_rows[id_col].to_numpy()
    mat = _normalize(np.stack(all_rows[vec_col].to_numpy()))
    ref = ray.put((ids, mat))

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        bids, bmat = ray.get(ref)
        vecs = _normalize(np.stack(batch[vec_col].to_numpy()))
        my_ids = batch[id_col].to_numpy()
        scores = vecs @ bmat.T
        out_a, out_b, out_s = [], [], []
        for i in range(len(my_ids)):
            hits = np.where(scores[i] >= threshold)[0]
            for j in hits:
                if my_ids[i] < bids[j]:  # dedupe ordered pairs
                    out_a.append(my_ids[i])
                    out_b.append(bids[j])
                    out_s.append(float(scores[i, j]))
        return pd.DataFrame({"id_a": out_a, "id_b": out_b, "cosine": out_s})

    return (
        corpus.map_batches(score, batch_format="pandas")
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
