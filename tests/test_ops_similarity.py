"""Similarity search: brute-force cosine top-k vs a numpy oracle, LSH
variant recall, embedding near-dup pairs."""

import numpy as np
import pandas as pd
import ray.data

from matomo_log_analytics_ray.ops import similarity


def _corpus(n=200, d=16, seed=7):
    rng = np.random.default_rng(seed)
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    df = pd.DataFrame({"vec_id": np.arange(n), "embedding": list(vecs)})
    return df, vecs


def _oracle_topk(vecs, qvecs, k):
    def norm(m):
        return m / np.linalg.norm(m, axis=1, keepdims=True)

    scores = norm(vecs) @ norm(qvecs).T  # (n, nq)
    return [np.argsort(-scores[:, j])[:k] for j in range(qvecs.shape[0])]


def test_brute_force_topk_matches_numpy_oracle():
    df, vecs = _corpus()
    qvecs = vecs[[3, 50]] + 0.01  # near rows 3 and 50
    ds = ray.data.from_pandas(df).repartition(4)
    got = similarity.brute_force_topk(ds, np.array([0, 1]), qvecs, k=5)
    want = _oracle_topk(vecs, qvecs, 5)
    for qid in (0, 1):
        ids = got[got["query_id"] == qid].sort_values("rank")["vec_id"].tolist()
        assert ids == list(want[qid])
    # scores sorted descending within query
    for qid in (0, 1):
        s = got[got["query_id"] == qid].sort_values("rank")["score"].to_numpy()
        assert (np.diff(s) <= 1e-6).all()


def test_lsh_topk_returns_self_match():
    df, vecs = _corpus()
    ds = ray.data.from_pandas(df)
    got = similarity.lsh_topk(ds, np.array([0]), vecs[[42]], k=3)
    # the query IS corpus row 42 — its own bucket must contain it, rank 0
    assert got[got["rank"] == 0]["vec_id"].iloc[0] == 42


def test_embedding_near_dup_pairs():
    df, vecs = _corpus(n=50)
    # inject two near-identical rows
    emb = list(df["embedding"])
    emb[1] = vecs[0] + 1e-4
    df["embedding"] = emb
    ds = ray.data.from_pandas(df)
    pairs = similarity.embedding_near_dup(ds, threshold=0.999)
    assert ((pairs["id_a"] == 0) & (pairs["id_b"] == 1)).any()
    # no self-pairs, ordered ids
    assert (pairs["id_a"] < pairs["id_b"]).all()


def test_on_driver_embeddings_table(tmp_path):
    ds = ray.data.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
    df = ds.to_pandas()
    q = np.stack(df["embedding"].to_numpy()[:2])
    got = similarity.brute_force_topk(ds, np.array([0, 1]), q, k=3)
    # self-match at rank 0 with score ~1
    r0 = got[(got["query_id"] == 0) & (got["rank"] == 0)]
    assert r0["vec_id"].iloc[0] == df["vec_id"].iloc[0]
    assert abs(r0["score"].iloc[0] - 1.0) < 1e-5


def test_ivf_topk_recall_on_clustered_corpus():
    # clustered corpus: IVF with nprobe covering the query's cluster
    # must reach high recall vs exact brute force
    rng = np.random.default_rng(11)
    centers = rng.standard_normal((8, 16)).astype(np.float32) * 4
    assign = rng.integers(0, 8, size=400)
    vecs = centers[assign] + rng.standard_normal((400, 16)).astype(np.float32) * 0.3
    df = pd.DataFrame({"vec_id": np.arange(400), "embedding": list(vecs)})
    ds = ray.data.from_pandas(df).repartition(4)
    qvecs = vecs[[7, 123]]
    exact = _oracle_topk(vecs, qvecs, 10)
    got = similarity.ivf_topk(ds, np.array([0, 1]), qvecs, k=10, nlist=8, nprobe=4, train_n=400)
    for qid in (0, 1):
        ids = set(got[got["query_id"] == qid]["vec_id"].tolist())
        recall = len(ids & set(exact[qid].tolist())) / 10
        assert recall >= 0.8, recall
    # the query IS a corpus member: must find itself at rank 0
    assert got[(got["query_id"] == 0) & (got["rank"] == 0)]["vec_id"].iloc[0] == 7


def test_bucketed_near_dup_matches_broadcast_path():
    rng = np.random.default_rng(23)
    base = rng.standard_normal((60, 16)).astype(np.float32)
    # 6 planted near-dup pairs: tiny perturbations of existing rows
    dups = base[:6] + rng.standard_normal((6, 16)).astype(np.float32) * 0.01
    vecs = np.vstack([base, dups])
    df = pd.DataFrame({"vec_id": np.arange(len(vecs)), "embedding": list(vecs)})
    ds = ray.data.from_pandas(df).repartition(3)
    exact = similarity.embedding_near_dup(ds, threshold=0.98)
    bucketed = similarity.embedding_near_dup_bucketed(ds, threshold=0.98)
    exact_pairs = set(zip(exact["id_a"], exact["id_b"]))
    got_pairs = set(zip(bucketed["id_a"], bucketed["id_b"]))
    # bucketed path may only MISS pairs (recall < 1), never invent them
    assert got_pairs <= exact_pairs
    assert len(got_pairs) >= 0.9 * len(exact_pairs)
    # the 6 planted pairs are the easy ones — all must be found
    planted = {(i, 60 + i) for i in range(6)}
    assert planted <= got_pairs


def test_topk_partial_rows_tie_break_keeps_smallest_id():
    # Two corpus rows with IDENTICAL vectors tie exactly at the k-th
    # place; the tie-aware partial must forward the smaller id (the
    # ROW_NUMBER ... ORDER BY score DESC, id oracle order), which a
    # bare argpartition does not guarantee.
    rng = np.random.default_rng(3)
    d = 8
    q = rng.standard_normal((1, d)).astype(np.float32)
    # build scores directly: duplicate vector => duplicate score
    base = rng.standard_normal((5, d)).astype(np.float32)
    base[4] = base[1]  # ids 1 and 4 tie exactly
    vecs = base / np.linalg.norm(base, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    scores = vecs @ qn.T  # (5, 1)
    ids = np.arange(5)
    # k=1 .. 5: output must equal the full (score desc, id asc) sort
    order = np.lexsort((ids, -scores[:, 0]))
    for k in range(1, 6):
        gq, gi, gs = similarity._topk_partial_rows(scores, ids, np.array([0]), k)
        assert list(gi) == list(ids[order][:k]), f"k={k}"
    # tied pair must come out smaller-id first
    s_tied = scores[1, 0]
    gq, gi, gs = similarity._topk_partial_rows(scores, ids, np.array([0]), 5)
    tied_ids = [i for i, s in zip(gi, gs) if s == s_tied]
    assert tied_ids == sorted(tied_ids)


def test_topk_partial_rows_masked_rows_never_emitted():
    scores = np.array([[0.9], [-np.inf], [0.5]])
    ids = np.arange(3)
    gq, gi, gs = similarity._topk_partial_rows(scores, ids, np.array([7]), 3)
    assert list(gi) == [0, 2]
    assert np.isfinite(gs).all()
