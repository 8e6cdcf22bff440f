"""Product quantization (PQ): compress an embedding column into m
subspace codes — the storage/scale path for vector corpora (a 100 TB
float corpus becomes m bytes/vector; IVF-PQ is the standard ANN
memory layout, cf. Jegou et al., "Product Quantization for Nearest
Neighbor Search").

Shape: training is a driver-side deterministic per-subspace Lloyd
k-means on a bounded sample (exactly the ops/similarity.kmeans_centroids
discipline); encoding is ONE stateless map_batches pass — the (m, k,
sub_dim) codebook broadcasts once via ray.put, each batch computes all
m argmins vectorized (matmul expansion, no per-row Python), and only
(id, sub, code) int rows leave the workers. No shuffle anywhere.

Beyond-reference op; gated by SQL replay of the trained codebooks
(literal VALUES + list_distance argmin), same pattern as the trained
IVF gate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data


def train_pq_codebooks(
    sample: np.ndarray, m: int = 8, k: int = 16, iters: int = 10, seed: int = 0x5EED
) -> np.ndarray:
    """(m, k, dim/m) float64 codebooks: plain-L2 Lloyd per subspace on
    a driver-side sample, deterministic (seeded init, fixed iters)."""
    sample = np.asarray(sample, dtype=np.float64)
    d = sample.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    books = []
    for j in range(m):
        s = sample[:, j * sub : (j + 1) * sub]
        rng = np.random.default_rng(seed + j)
        cent = s[rng.choice(len(s), size=min(k, len(s)), replace=False)].copy()
        for _ in range(iters):
            d2 = (
                (s * s).sum(axis=1, keepdims=True)
                - 2.0 * (s @ cent.T)
                + (cent * cent).sum(axis=1)
            )
            assign = d2.argmin(axis=1)
            for c in range(len(cent)):
                members = s[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        books.append(cent)
    return np.stack(books)


def pq_encode(
    ds: "ray.data.Dataset",
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> "ray.data.Dataset":
    """(id, sub, code): nearest codebook entry per subspace (L2,
    ties to the smaller code). m rows per vector."""
    ref = ray.put(np.asarray(codebooks, dtype=np.float64))

    def enc(b: pd.DataFrame) -> pd.DataFrame:
        cb = ray.get(ref)
        m, _, sub = cb.shape
        if len(b) == 0:
            return pd.DataFrame(
                {
                    id_col: b[id_col],
                    "sub": pd.Series([], dtype="int64"),
                    "code": pd.Series([], dtype="int64"),
                }
            )
        mat = np.stack(b[vec_col].to_numpy()).astype(np.float64)
        n = len(mat)
        code_mat = np.empty((n, m), dtype=np.int64)
        for j in range(m):
            s = mat[:, j * sub : (j + 1) * sub]
            d2 = (
                (s * s).sum(axis=1, keepdims=True)
                - 2.0 * (s @ cb[j].T)
                + (cb[j] * cb[j]).sum(axis=1)
            )
            code_mat[:, j] = d2.argmin(axis=1)
        return pd.DataFrame(
            {
                id_col: np.repeat(b[id_col].to_numpy(), m),
                "sub": np.tile(np.arange(m, dtype=np.int64), n),
                "code": code_mat.ravel(),
            }
        )

    return ds.map_batches(enc, batch_format="pandas")


def pq_train_encode(
    ds: "ray.data.Dataset",
    m: int = 8,
    k: int = 16,
    train_n: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> "ray.data.Dataset":
    """Train on the first ``train_n`` rows (file order — deterministic,
    same discipline as similarity.ivf_topk) then encode the corpus."""
    train = np.stack(ds.limit(train_n).to_pandas()[vec_col].to_numpy())
    books = train_pq_codebooks(train, m=m, k=k)
    return pq_encode(ds, books, id_col=id_col, vec_col=vec_col)
