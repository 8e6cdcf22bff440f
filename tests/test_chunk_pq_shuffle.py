"""ops/chunk, ops/pq, ops/split.epoch_shuffle: partition-invariant
results equal to plain pandas/numpy references."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from matomo_log_analytics_ray.ops import chunk, pq, split


def _docs(n=60, seed=3):
    rng = np.random.default_rng(seed)
    texts = ["".join(rng.choice(list("abcdef "), size=rng.integers(0, 400)))
             for _ in range(n)]
    return pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64), "text": texts})


def _chunks_reference(df, size, overlap):
    stride = size - overlap
    rows = []
    for r in df.itertuples():
        t = r.text
        n = 1 if len(t) <= size else -(-(len(t) - size) // stride) + 1
        for k in range(n):
            c = t[k * stride : k * stride + size]
            rows.append((r.doc_id, k, c, len(c)))
    return pd.DataFrame(rows, columns=["doc_id", "chunk_idx", "chunk", "chunk_chars"])


def test_chunking_matches_reference_any_partitioning():
    df = _docs()
    want = _chunks_reference(df, 120, 40).sort_values(
        ["doc_id", "chunk_idx"]).reset_index(drop=True)
    for nblocks in (1, 7):
        got = (
            chunk.chunk_documents(
                ray.data.from_pandas(df).repartition(nblocks), size=120, overlap=40
            )
            .to_pandas()
            .sort_values(["doc_id", "chunk_idx"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want)


def test_chunking_overlap_invariant():
    # consecutive chunks share exactly `overlap` chars (except the last)
    df = _docs(10, seed=9)
    out = chunk.chunk_documents(
        ray.data.from_pandas(df), size=50, overlap=20
    ).to_pandas()
    for _, g in out.groupby("doc_id"):
        g = g.sort_values("chunk_idx")
        cs = g["chunk"].tolist()
        for a, b in zip(cs, cs[1:]):
            assert a[30:] == b[: len(a[30:])]


def test_chunk_rejects_bad_overlap():
    with pytest.raises(ValueError):
        chunk.chunk_documents(ray.data.from_pandas(_docs(2)), size=10, overlap=10)


def test_pq_encode_matches_numpy_reference():
    rng = np.random.default_rng(5)
    vecs = rng.normal(size=(300, 32)).astype(np.float32)
    df = pd.DataFrame(
        {"vec_id": np.arange(300, dtype=np.int64), "embedding": list(vecs)}
    )
    books = pq.train_pq_codebooks(vecs[:128], m=4, k=8)
    got = (
        pq.pq_encode(ray.data.from_pandas(df).repartition(5), books)
        .to_pandas()
        .pivot(index="vec_id", columns="sub", values="code")
        .to_numpy()
    )
    mat = vecs.astype(np.float64)
    want = np.stack(
        [
            ((mat[:, j * 8 : (j + 1) * 8][:, None, :] - books[j][None, :, :]) ** 2)
            .sum(-1)
            .argmin(1)
            for j in range(4)
        ],
        axis=1,
    )
    assert np.array_equal(got, want)
    # codes reconstruct closer than random codes (sanity: training works)
    recon = np.concatenate([books[j][want[:, j]] for j in range(4)], axis=1)
    rand = np.concatenate(
        [books[j][(want[:, j] + 3) % 8] for j in range(4)], axis=1
    )
    assert ((mat - recon) ** 2).sum() < ((mat - rand) ** 2).sum()


def test_epoch_shuffle_deterministic_and_complete():
    df = pd.DataFrame({"doc_id": np.arange(1000, dtype=np.int64)})
    a = split.epoch_shuffle(
        ray.data.from_pandas(df).repartition(4), n_shards=8, epoch=1
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = split.epoch_shuffle(
        ray.data.from_pandas(df).repartition(9), n_shards=8, epoch=1
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)  # partition-invariant
    # every id present once; positions are 1..len(shard) per shard
    assert sorted(a["doc_id"]) == list(range(1000))
    for _, g in a.groupby("shard"):
        assert sorted(g["pos"]) == list(range(1, len(g) + 1))
    # a different epoch produces a different order
    c = split.epoch_shuffle(
        ray.data.from_pandas(df).repartition(4), n_shards=8, epoch=2
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert not a[["shard", "pos"]].equals(c[["shard", "pos"]])


def test_pmi_collocations_matches_pandas_reference():
    import math

    from matomo_log_analytics_ray.ops import colloc

    docs = pd.DataFrame(
        {
            "text": (
                ["the quick fox"] * 6          # "the quick", "quick fox" x6
                + ["quick fox runs"] * 4       # "quick fox" 4 more
                + ["the slow dog", None, ""]
            )
        }
    )
    out = (
        colloc.pmi_collocations(
            ray.data.from_pandas(docs).repartition(4), min_count=5
        )
        .to_pandas()
        .sort_values(["w1", "w2"])
        .reset_index(drop=True)
    )
    # reference counts
    toks = [t.lower().split() for t in docs["text"].fillna("") if t]
    bigs = [(a, b) for ws in toks for a, b in zip(ws, ws[1:])]
    unis = [w for ws in toks for w in ws]
    import collections

    bc, uc = collections.Counter(bigs), collections.Counter(unis)
    want = []
    for (a, b), n in sorted(bc.items()):
        if n >= 5:
            pmi = math.log(
                (n / len(bigs)) / ((uc[a] / len(unis)) * (uc[b] / len(unis)))
            )
            want.append((a, b, n, round(pmi, 6)))
    got = list(out.itertuples(index=False, name=None))
    assert got == want
    assert {("the", "quick"), ("quick", "fox")} == {(a, b) for a, b, *_ in got}


def test_bm25_matches_reference_and_partitioning():
    import math

    from matomo_log_analytics_ray.ops import bm25

    docs = pd.DataFrame(
        {
            "doc_id": np.arange(8, dtype=np.int64),
            "text": [
                "fast hash join", "hash hash hash table", "slow scan",
                "fast fast merge", "table value scan", "", None,
                "merge sort fast hash",
            ],
        }
    )
    queries = {"q": "fast hash"}

    def ref():
        toks = [(t or "").lower().split() for t in docs["text"]]
        n, avg = len(toks), sum(len(w) for w in toks) / len(toks)
        out = {}
        for term in ("fast", "hash"):
            df = sum(term in w for w in toks)
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1)
            for i, w in enumerate(toks):
                tf = w.count(term)
                if tf:
                    out[i] = out.get(i, 0.0) + idf * tf * 2.2 / (
                        tf + 1.2 * (1 - 0.75 + 0.75 * len(w) / avg)
                    )
        return {i: round(s, 6) for i, s in out.items()}

    want = ref()
    for nblocks in (1, 5):
        got = bm25.bm25_scores(
            ray.data.from_pandas(docs).repartition(nblocks), queries
        ).to_pandas()
        assert dict(zip(got["doc_id"], got["score"])) == want
