"""ops/mmr: two-stage distributed MMR equals an independent in-memory
reference (same prefilter-M + greedy semantics) across block layouts,
and its selections are genuinely more diverse than plain top-k."""

import numpy as np
import pandas as pd
import ray.data

from matomo_log_analytics_ray.ops import mmr


def _make(n=400, d=8, seed=21):
    rng = np.random.default_rng(seed)
    # clustered vectors so diversity matters
    centers = rng.normal(size=(6, d))
    v = centers[rng.integers(0, 6, size=n)] + 0.15 * rng.normal(size=(n, d))
    return pd.DataFrame(
        {"vec_id": np.arange(n, dtype="int64"), "embedding": list(v)}
    )


def _reference(df, q, k, lam, m):
    V = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
    qn = q / max(np.linalg.norm(q), 1e-12)
    rel = Vn @ qn
    ids = df["vec_id"].to_numpy()
    # prefilter: top-m by (rel desc, id asc)
    order = np.lexsort((ids, -rel))[:m]
    cids, cV, crel = ids[order], Vn[order], rel[order]
    sel = []
    max_sim = np.zeros(len(cids))
    picked = np.zeros(len(cids), dtype=bool)
    idorder = np.argsort(cids)
    for r in range(k):
        s = lam * crel - (1 - lam) * max_sim
        s[picked] = -np.inf
        best = idorder[np.argmax(s[idorder])]
        sel.append((r, cids[best]))
        picked[best] = True
        max_sim = np.maximum(max_sim, cV @ cV[best])
    return sel


def test_mmr_matches_reference_across_blocks():
    df = _make()
    rng = np.random.default_rng(1)
    q = rng.normal(size=8)
    want = _reference(df, q, k=15, lam=0.7, m=100)
    for nblocks in (1, 6):
        ds = ray.data.from_pandas(df).repartition(nblocks)
        got = mmr.mmr_select(ds, q, k=15, lam=0.7, prefilter_m=100)
        assert list(zip(got["rank"], got["vec_id"])) == want


def test_mmr_lam1_equals_topk_relevance():
    df = _make(seed=3)
    q = np.ones(8)
    got = mmr.mmr_select(
        ray.data.from_pandas(df), q, k=10, lam=1.0, prefilter_m=50
    )
    # lam=1 degenerates to pure relevance ranking
    assert (got["relevance"].to_numpy()[:-1] >= got["relevance"].to_numpy()[1:]).all()


def test_mmr_diversifies_vs_topk():
    df = _make(seed=5)
    q = np.zeros(8)
    q[0] = 1.0
    top = mmr.mmr_select(ray.data.from_pandas(df), q, k=10, lam=1.0)
    div = mmr.mmr_select(ray.data.from_pandas(df), q, k=10, lam=0.3)

    def mean_pair_sim(ids):
        V = np.stack(
            df.set_index("vec_id").loc[ids]["embedding"].to_numpy()
        ).astype(np.float64)
        V = V / np.linalg.norm(V, axis=1, keepdims=True)
        S = V @ V.T
        iu = np.triu_indices(len(ids), 1)
        return S[iu].mean()

    assert mean_pair_sim(div["vec_id"].tolist()) < mean_pair_sim(
        top["vec_id"].tolist()
    )
