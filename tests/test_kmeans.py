"""ops/kmeans: distributed Lloyd's — recovers planted blobs, is
deterministic and partition-invariant, inertia decreases."""

import numpy as np
import pandas as pd
import ray.data

from matomo_log_analytics_ray.ops import kmeans


def _blobs(n_per=200, d=8, seed=3):
    rng = np.random.default_rng(seed)
    centers = np.array([[5.0] * d, [-5.0] * d, [5.0] * (d // 2) + [-5.0] * (d // 2)])
    vecs = np.concatenate(
        [c + rng.normal(scale=0.3, size=(n_per, d)) for c in centers]
    ).astype(np.float32)
    ids = np.arange(len(vecs), dtype=np.int64)
    return pd.DataFrame({"vec_id": ids, "embedding": list(vecs)}), centers


def test_kmeans_recovers_blobs_partition_invariant():
    df, centers = _blobs()
    outs = []
    for nblocks in (1, 6):
        ds = ray.data.from_pandas(df).repartition(nblocks)
        cent, inertia = kmeans.kmeans_fit(ds, k=3, n_iters=15)
        assign = (
            kmeans.kmeans_assign(ds, cent)
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        outs.append((np.round(cent, 6), assign))
        # every learned centroid sits close to one true center
        d2 = ((cent[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
        assert (d2.min(axis=1) < 1.0).all()
        # blob purity: each true blob maps to a single cluster
        lab = assign["cluster"].to_numpy()
        for b in range(3):
            blob = lab[b * 200 : (b + 1) * 200]
            assert (blob == blob[0]).all()
    np.testing.assert_array_equal(outs[0][0], outs[1][0])
    pd.testing.assert_frame_equal(outs[0][1], outs[1][1])
