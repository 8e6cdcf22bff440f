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


def _topk_partial_rows(
    scores: np.ndarray, ids: np.ndarray, query_ids: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-query top-k of one batch under EXACT (score desc, id asc)
    order — tie-aware, unlike a bare argpartition (which forwards an
    arbitrary member of a k-th-place tie, so the globally smallest id
    could never reach the merge and the ROW_NUMBER oracle would pick a
    different row). Candidates = every finite row scoring >= the k-th
    partitioned score; a lexsort on (-score, id) then keeps k. -inf
    scores (masked-out rows) are never emitted."""
    n, nq = scores.shape
    k = min(k, n)
    if k == 0:
        e = ids[:0]
        return query_ids[:0], e, np.empty(0, dtype=np.float64)
    part = np.argpartition(-scores, k - 1, axis=0)[:k]  # (k, nq), unordered
    kth = np.take_along_axis(scores, part, axis=0).min(axis=0)  # (nq,)
    rows_q, rows_i, rows_s = [], [], []
    for j in range(nq):
        col = scores[:, j]
        finite = col > -np.inf
        cand = np.flatnonzero(finite & (col >= kth[j]))
        if len(cand) == 0:
            continue
        order = np.lexsort((ids[cand], -col[cand]))[:k]
        sel = cand[order]
        rows_q.append(np.full(len(sel), query_ids[j]))
        rows_i.append(ids[sel])
        rows_s.append(col[sel])
    if not rows_q:
        return query_ids[:0], ids[:0], np.empty(0, dtype=np.float64)
    return (
        np.concatenate(rows_q),
        np.concatenate(rows_i),
        np.concatenate(rows_s),
    )


def brute_force_topk(
    corpus: "ray.data.Dataset",
    query_ids: np.ndarray,
    query_vectors: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    concurrency: int | tuple | None = None,
) -> pd.DataFrame:
    """Exact cosine top-k; returns (query_id, vec_id, score, rank).

    Stateless TASK map, not an actor pool: the scorer's only state is
    the broadcast query matrix, which rides the object store —
    ``ray.get`` of the same ref inside a warm worker is a zero-copy
    shared-memory read, so tasks pay none of the per-actor process
    spin-up (~0.5 s x pool size) a query-latency path can't amortize.
    ``concurrency`` caps parallel tasks when given (default: let the
    scheduler use the pool)."""
    ref = ray.put(
        {
            "ids": np.asarray(query_ids),
            "qmat": _normalize(np.stack(np.asarray(query_vectors))),
        }
    )

    def score_topk(batch: pd.DataFrame) -> pd.DataFrame:
        q = ray.get(ref)
        vecs = _normalize(np.stack(batch[vec_col].to_numpy()))  # (n, d)
        ids = batch[id_col].to_numpy()
        scores = vecs @ q["qmat"].T  # (n, nq)
        qo, io, so = _topk_partial_rows(scores, ids, q["ids"], k)
        return pd.DataFrame({"query_id": qo, id_col: io, "score": so})

    kwargs = {} if concurrency is None else {"concurrency": concurrency}
    partials = corpus.map_batches(
        score_topk, batch_format="pandas", **kwargs
    ).to_pandas()  # (n_batches x k x nq) rows — small
    return _merge_topk_partials(partials, k, id_col)


def _merge_topk_partials(partials: pd.DataFrame, k: int, id_col: str) -> pd.DataFrame:
    """Tiny driver-side merge of per-batch partial top-k rows; ties
    broken by ascending id (the same ORDER BY score DESC, id the SQL
    oracle uses)."""
    if partials.empty:
        return pd.DataFrame(columns=["query_id", id_col, "score", "rank"])
    out = []
    for qid, g in partials.groupby("query_id", sort=True):
        best = g.sort_values(
            ["score", id_col], ascending=[False, True], kind="mergesort"
        ).head(k)
        for rank, r in enumerate(best.itertuples(index=False)):
            out.append((qid, getattr(r, id_col), float(r.score), rank))
    return pd.DataFrame(out, columns=["query_id", id_col, "score", "rank"])


def signature_bits(
    vectors: np.ndarray,
    n_bits: int = 8,
    dim: int | None = None,
    planes: np.ndarray | None = None,
) -> np.ndarray:
    """Random-hyperplane LSH signature (deterministic planes; pass
    explicit ``planes`` (d, n_bits) for SQL-replayable fixed-plane
    gating)."""
    vectors = np.asarray(vectors, dtype=np.float32)
    if planes is None:
        planes = np.random.default_rng(0x5EED).standard_normal(
            (vectors.shape[1] if dim is None else dim, n_bits)
        ).astype(np.float32)
    else:
        planes = np.asarray(planes, dtype=np.float32)
    bits = (vectors @ planes) > 0
    weights = (1 << np.arange(n_bits)).astype(np.int64)
    return bits @ weights


class MaskedTopKScorer:
    """map_batches actor for bucketed ANN: each batch scores ONLY the
    rows allowed for each query (same LSH bucket, or a probed IVF list)
    against the broadcast query matrix, emitting per-batch partial
    top-k rows. Nothing but (query_id, id, score) partials ever leave
    the workers — no candidate materialization on the driver."""

    def __init__(self, payload_ref, k: int, id_col: str, vec_col: str):
        p = ray.get(payload_ref) if isinstance(payload_ref, ray.ObjectRef) else payload_ref
        self.kind = p["kind"]
        self.query_ids = np.asarray(p["query_ids"])
        self.qmat = p["qmat"]  # already normalized (nq, d)
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col
        if self.kind == "lsh":
            self.n_bits = p["n_bits"]
            self.qsig = np.asarray(p["qsig"])
            self.planes = p.get("planes")
        else:  # ivf
            self.cent = p["cent"]  # (nlist, d) normalized
            self.membership = p["membership"]  # (nlist, nq) bool

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        raw = np.stack(batch[self.vec_col].to_numpy())
        ids = batch[self.id_col].to_numpy()
        vecs = _normalize(raw)
        if self.kind == "lsh":
            sig = signature_bits(raw, self.n_bits, planes=self.planes)
            allowed = sig[:, None] == self.qsig[None, :]  # (n, nq)
        else:
            lists = np.argmax(vecs @ self.cent.T, axis=1)
            allowed = self.membership[lists]  # (n, nq)
        if not allowed.any():
            return pd.DataFrame(
                {
                    "query_id": self.query_ids[:0],
                    self.id_col: ids[:0],
                    "score": pd.Series([], dtype="float64"),
                }
            )
        scores = np.where(allowed, vecs @ self.qmat.T, -np.inf)  # (n, nq)
        q, i, s = _topk_partial_rows(scores, ids, self.query_ids, self.k)
        return pd.DataFrame({"query_id": q, self.id_col: i, "score": s})


def lsh_topk(
    corpus: "ray.data.Dataset",
    query_ids: np.ndarray,
    query_vectors: np.ndarray,
    k: int = 10,
    n_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    concurrency: int | tuple = 2,
    planes: np.ndarray | None = None,
) -> pd.DataFrame:
    """Approximate top-k: corpus rows hashed into 2^n_bits buckets; each
    query scores only its own bucket — INSIDE the scan (per-batch
    partial top-k + tiny merge); no bucket rows are materialized on the
    driver. Partitioning assumption: bucket skew is bounded because
    hyperplane signs of roughly-isotropic embeddings are near-uniform;
    pathological skew needs more bits."""
    qsig = signature_bits(np.asarray(query_vectors), n_bits, planes=planes)
    ref = ray.put(
        {
            "kind": "lsh",
            "query_ids": np.asarray(query_ids),
            "qmat": _normalize(np.asarray(query_vectors)),
            "qsig": qsig,
            "n_bits": n_bits,
            "planes": planes,
        }
    )
    partials = corpus.map_batches(
        MaskedTopKScorer,
        fn_constructor_kwargs={
            "payload_ref": ref,
            "k": k,
            "id_col": id_col,
            "vec_col": vec_col,
        },
        batch_format="pandas",
        concurrency=concurrency,
    ).to_pandas()
    return _merge_topk_partials(partials, k, id_col)


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
    concurrency: int | tuple = 2,
    centroids: "np.ndarray | None" = None,
) -> pd.DataFrame:
    """IVF approximate top-k — the classic scale path for ANN:

    1. train: k-means centroids on a driver-side sample (limit train_n);
    2. probe: each query selects its nprobe nearest centroids;
    3. scan+score: one distributed map_batches pass assigns every
       corpus row to its nearest centroid and scores rows landing in a
       probed list against the broadcast query matrix, emitting
       per-batch partial top-k rows (the broadcast is just the
       (nlist, d) centroid matrix + (nq, d) queries);
    4. merge: the global top-k is a tiny driver merge over
       (batches x k x nq) partial rows — the 1/(nlist/nprobe) corpus
       fraction surviving the filter never leaves the workers.

    Partitioning assumption: inverted lists are roughly balanced; a
    pathologically clustered corpus needs more lists (bigger nlist)
    exactly as in FAISS-style IVF."""
    if centroids is not None:
        # caller-supplied (e.g. fixed constants for the SQL-exact gate,
        # or a model trained by ops/kmeans) — must be L2-normalized
        cent = _normalize(np.asarray(centroids, dtype=np.float64))
    else:
        train = np.stack(
            corpus.limit(train_n).to_pandas()[vec_col].to_numpy()
        )
        cent = kmeans_centroids(train, nlist=nlist)
    qmat = _normalize(np.asarray(query_vectors))
    # (nq, nprobe) probed list ids per query -> (nlist, nq) membership
    probed = np.argsort(-(qmat @ cent.T), axis=1)[:, :nprobe]
    membership = np.zeros((len(cent), len(qmat)), dtype=bool)
    for qi in range(len(qmat)):
        membership[probed[qi], qi] = True
    ref = ray.put(
        {
            "kind": "ivf",
            "query_ids": np.asarray(query_ids),
            "qmat": qmat,
            "cent": cent,
            "membership": membership,
        }
    )
    partials = corpus.map_batches(
        MaskedTopKScorer,
        fn_constructor_kwargs={
            "payload_ref": ref,
            "k": k,
            "id_col": id_col,
            "vec_col": vec_col,
        },
        batch_format="pandas",
        concurrency=concurrency,
    ).to_pandas()
    return _merge_topk_partials(partials, k, id_col)


def embedding_near_dup_bucketed(
    corpus: "ray.data.Dataset",
    threshold: float = 0.95,
    n_bands: int = 8,
    band_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int = 256,
    num_partitions: int = 8,
) -> pd.DataFrame:
    """Approximate distributed near-dup — the scale path for HIGH
    thresholds. Three stages, none of which broadcasts the corpus or
    uses map_groups:

    1. band rows: each row hashed into ``n_bands`` independent
       random-hyperplane signatures — only (band, sig, id) projections
       shuffle, never vectors;
    2. candidates: ops.dedup.bucket_pairs sorted-run machinery emits
       (id_a < id_b) pairs sharing any (band, sig) bucket, then
       sorted_group_counts deduplicates pairs across bands;
    3. verify: two hash joins attach the pair's two vectors (only
       candidate pairs shuffle the embedding payload) and a vectorized
       map_batches computes exact cosine, keeping pairs >= threshold.

    Recall: a pair at cosine t agrees on one hyperplane sign with
    probability 1 - acos(t)/pi (~0.9 at t=0.95), so P(pair shares at
    least one of 8 8-bit band signatures) ~ 1-(1-0.9^8)^8 ~ 0.98.
    Near/below t~0.7 that probability collapses and LSH stops pruning
    — use embedding_near_dup (exact tiled all-pairs) there instead.
    Partitioning assumption: bucket sizes stay bounded for roughly
    isotropic embeddings; raise band_bits if a bucket grows hot.
    """
    from . import dedup as dedup_ops

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
            frames.append(pd.DataFrame({"band": band, "sig": sig, id_col: ids}))
        return pd.concat(frames, ignore_index=True)

    rows = corpus.map_batches(band_rows, batch_format="pandas")
    cand = dedup_ops.bucket_pairs(rows, ["band", "sig"], id_col, max_bucket=max_bucket)
    cand = dedup_ops.sorted_group_counts(cand, ["id_a", "id_b"], alias="n_bands")
    pairs = verify_pairs_cosine(
        cand.select_columns(["id_a", "id_b"]),
        corpus,
        threshold=threshold,
        id_col=id_col,
        vec_col=vec_col,
        num_partitions=num_partitions,
    )
    return pairs.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def verify_pairs_cosine(
    pairs: "ray.data.Dataset",
    corpus: "ray.data.Dataset",
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_partitions: int = 8,
) -> pd.DataFrame:
    """Distributed exact-cosine verification of candidate (id_a, id_b)
    pairs: two hash-partitioned joins attach each side's vector, then a
    vectorized batch kernel computes cosine and filters >= threshold.
    Only candidate pairs (small by construction) carry vector payloads
    through the shuffle."""
    from . import dedup as dedup_ops

    id_t = dedup_ops.arrow_col_type(corpus, id_col)

    def _renamer(ident: str, emb: str):
        import pyarrow as pa
        import pyarrow.compute as pc

        def fn(t: "pa.Table") -> "pa.Table":
            # vectors packed to float64 bytes: Arrow's hash join rejects
            # nested/tensor payload columns, binary passes through fine.
            # Arrow in/out with explicit types so an empty block can't
            # emit a null-typed column that poisons the join aggregator.
            df = t.to_pandas()
            packed = [
                np.asarray(v, dtype=np.float64).tobytes()
                for v in df[vec_col].to_numpy()
            ]
            return pa.table(
                {
                    ident: pc.cast(t[id_col], id_t),
                    emb: pa.array(packed, type=pa.binary()),
                }
            )

        return fn

    emb_a = corpus.map_batches(_renamer("id_a", "emb_a"), batch_format="pyarrow")
    emb_b = corpus.map_batches(_renamer("id_b", "emb_b"), batch_format="pyarrow")

    _id_t = dedup_ops.arrow_col_type(corpus, id_col)
    pairs = dedup_ops.normalize_pair_ids(pairs, _id_t, num_partitions)
    if pairs.count() == 0:  # zero candidates: joining would fail on
        import pyarrow as _pa  # schema-less empty partitions

        return dedup_ops.typed_empty_pairs(_id_t, {"cosine": _pa.float64()})
    j = pairs.join(emb_a, "inner", num_partitions=num_partitions, on=("id_a",))
    j = j.join(emb_b, "inner", num_partitions=num_partitions, on=("id_b",))

    def cosine_batch(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {
                    "id_a": b["id_a"],
                    "id_b": b["id_b"],
                    "cosine": pd.Series([], dtype="float64"),
                }
            )
        va = _normalize(
            np.stack([np.frombuffer(v, dtype=np.float64) for v in b["emb_a"]])
        )
        vb = _normalize(
            np.stack([np.frombuffer(v, dtype=np.float64) for v in b["emb_b"]])
        )
        cos = np.sum(va * vb, axis=1)
        keep = cos >= threshold
        return pd.DataFrame(
            {
                "id_a": b["id_a"].to_numpy()[keep],
                "id_b": b["id_b"].to_numpy()[keep],
                "cosine": cos[keep],
            }
        )

    return j.map_batches(cosine_batch, batch_format="pandas").to_pandas()


@ray.remote
def _cosine_tile(
    block_a, block_b, same: bool, threshold: float, id_col: str, vec_col: str
):
    """One tile of the exact all-pairs comparison: pairs >= threshold
    between two corpus chunks (upper triangle when same chunk)."""
    import pyarrow as pa

    def unpack(block):
        if isinstance(block, pa.Table):
            ids = block[id_col].to_numpy(zero_copy_only=False)
            mat = np.stack(block[vec_col].to_pandas().to_numpy())
        else:  # pandas block
            ids = block[id_col].to_numpy()
            mat = np.stack(block[vec_col].to_numpy())
        return ids, _normalize(mat)

    ids_a, mat_a = unpack(block_a)
    ids_b, mat_b = unpack(block_b)
    scores = mat_a @ mat_b.T
    if same:
        ia, ib = np.where(np.triu(scores >= threshold, k=1))
    else:
        ia, ib = np.where(scores >= threshold)
    a, b = ids_a[ia], ids_b[ib]
    swap = a > b
    a2, b2 = np.where(swap, b, a), np.where(swap, a, b)
    keep = a2 != b2
    return pd.DataFrame(
        {"id_a": a2[keep], "id_b": b2[keep], "cosine": scores[ia, ib][keep]}
    )


def embedding_near_dup(
    corpus: "ray.data.Dataset",
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_chunks: int = 8,
) -> pd.DataFrame:
    """EXACT cosine-threshold near-dup pairs via tiled all-pairs: the
    corpus is split into ``num_chunks`` object-store chunks and one Ray
    task per chunk pair (i <= j) fetches just its two chunks and emits
    qualifying pairs. Per-task memory is bounded by two chunks; the
    driver holds only chunk refs and the (small) qualifying pairs —
    the corpus is never materialized or broadcast whole. Exact
    all-pairs is inherently O(n^2) compute: C(C+1)/2 tiles spread that
    across the cluster, but for corpora where n^2 is unaffordable use
    the approximate family (minhash/simhash/``embedding_near_dup_bucketed``)
    — exactness below LSH-prunable thresholds has no sub-quadratic
    algorithm."""
    mat = (
        corpus.select_columns([id_col, vec_col])
        .repartition(num_chunks)
        .materialize()
    )
    refs = mat.to_arrow_refs()
    tiles = [
        _cosine_tile.remote(refs[i], refs[j], i == j, threshold, id_col, vec_col)
        for i in range(len(refs))
        for j in range(i, len(refs))
    ]
    frames = [f for f in ray.get(tiles) if len(f)]
    if not frames:
        return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
    return (
        pd.concat(frames, ignore_index=True)
        .drop_duplicates(subset=["id_a", "id_b"])
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
