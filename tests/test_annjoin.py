"""ops/annjoin: IVF-co-partitioned similarity join equals a numpy
reference (same nprobe=1 semantics) across block layouts; k>1 ranks
and empty-cluster edge cases covered."""

import numpy as np
import pandas as pd
import ray.data

from matomo_log_analytics_ray.ops import annjoin


def _make(n=300, d=6, seed=31):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, d))
    return pd.DataFrame(
        {"vec_id": np.arange(n, dtype="int64"), "embedding": list(v)}
    )


def _reference(ldf, rdf, cent, k, probes=1):
    def dists(V):
        return -2.0 * (V @ cent.T) + (cent * cent).sum(axis=1)[None, :]

    LV = np.stack(ldf["embedding"].to_numpy())
    RV = np.stack(rdf["embedding"].to_numpy())
    ln = LV / np.linalg.norm(LV, axis=1, keepdims=True)
    rn = RV / np.linalg.norm(RV, axis=1, keepdims=True)
    lcl = np.argsort(dists(LV), axis=1, kind="stable")[:, :probes]
    rcl = dists(RV).argmin(axis=1)
    out = []
    for i in range(len(ldf)):
        mask = np.isin(rcl, lcl[i])
        if not mask.any():
            continue
        rids = rdf["vec_id"].to_numpy()[mask]
        s = rn[mask] @ ln[i]
        order = np.lexsort((rids, -s))[:k]
        for r, j in enumerate(order):
            out.append((ldf["vec_id"].iloc[i], rids[j], round(float(s[j]), 9), r))
    return sorted(out)


def _got_tuples(out):
    df = out.to_pandas()
    return sorted(
        zip(
            df["qid"],
            df["nn_id"],
            df["score"].round(9),
            df["rank"],
        )
    )


def test_ann_join_matches_reference_k1_and_k3():
    df = _make()
    ldf, rdf = df.iloc[:200], df.iloc[200:]
    rng = np.random.default_rng(2)
    cent = rng.normal(size=(5, 6))
    for k in (1, 3):
        want = _reference(ldf, rdf, cent, k)
        for nblocks in (1, 4):
            lds = ray.data.from_pandas(ldf).repartition(nblocks)
            rds = ray.data.from_pandas(rdf).repartition(nblocks)
            got = _got_tuples(annjoin.ann_join(lds, rds, cent, k=k))
            assert [(a, b, d) for a, b, _, d in got] == [
                (a, b, d) for a, b, _, d in want
            ]
            np.testing.assert_allclose(
                [c for _, _, c, _ in got], [c for _, _, c, _ in want], atol=1e-6
            )


def test_ann_join_multiprobe_matches_reference():
    df = _make(seed=41)
    ldf, rdf = df.iloc[:180], df.iloc[180:]
    cent = np.random.default_rng(3).normal(size=(6, 6))
    for probes in (2, 3):
        want = _reference(ldf, rdf, cent, k=2, probes=probes)
        got = _got_tuples(
            annjoin.ann_join(
                ray.data.from_pandas(ldf).repartition(3),
                ray.data.from_pandas(rdf).repartition(2),
                cent,
                k=2,
                probes=probes,
            )
        )
        assert [(a, b, d) for a, b, _, d in got] == [
            (a, b, d) for a, b, _, d in want
        ]


def test_ann_join_more_probes_more_recall():
    df = _make(seed=51)
    ldf, rdf = df.iloc[:200], df.iloc[200:]
    cent = np.random.default_rng(5).normal(size=(8, 6))

    def best_scores(probes):
        out = annjoin.ann_join(
            ray.data.from_pandas(ldf),
            ray.data.from_pandas(rdf),
            cent,
            k=1,
            probes=probes,
        ).to_pandas()
        return out.set_index("qid")["score"]

    s1, s3 = best_scores(1), best_scores(3)
    common = s1.index.intersection(s3.index)
    assert (s3.loc[common] >= s1.loc[common] - 1e-12).all()
    assert len(s3) >= len(s1)


def test_ann_join_salted_path_identical():
    # max_group tiny -> every cluster salted; results must not change
    df = _make(seed=7)
    ldf, rdf = df.iloc[:220], df.iloc[220:]
    cent = np.random.default_rng(9).normal(size=(3, 6))
    want = _got_tuples(
        annjoin.ann_join(
            ray.data.from_pandas(ldf),
            ray.data.from_pandas(rdf),
            cent,
            k=2,
            max_group=None,
        )
    )
    got = _got_tuples(
        annjoin.ann_join(
            ray.data.from_pandas(ldf).repartition(5),
            ray.data.from_pandas(rdf).repartition(3),
            cent,
            k=2,
            max_group=10,
        )
    )
    assert got == want


def test_ann_join_empty_right_cluster_emits_nothing():
    # all right vectors land in cluster 0; left vectors in cluster 1
    cent = np.array([[10.0, 0.0], [0.0, 10.0]])
    ldf = pd.DataFrame(
        {"vec_id": [1, 2], "embedding": [np.array([0.1, 5.0])] * 2}
    )
    rdf = pd.DataFrame({"vec_id": [3], "embedding": [np.array([5.0, 0.1])]})
    out = annjoin.ann_join(
        ray.data.from_pandas(ldf), ray.data.from_pandas(rdf), cent
    ).to_pandas()
    assert len(out) == 0
