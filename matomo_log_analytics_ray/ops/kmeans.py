"""Distributed k-means (Lloyd's) over an embedding column.

The iterative-ML operator pattern on Ray Data: every iteration is one
stateless ``map_batches`` E-step emitting per-centroid (sum, count)
partials — O(k x dim) rows per block, the ops/vecagg shape — plus a
tiny driver M-step; the centroid matrix broadcasts once per round via
``ray.put``. Nothing materializes but k x dim floats, so the corpus
streams every round. Complements ops/similarity.kmeans_centroids
(driver-side sample training for IVF): this one runs the E-step over
the FULL corpus distributed, for when a sample is not representative.

Deterministic: init is greedy farthest-point (k-center seeding, the
deterministic cousin of k-means++) — start from the smallest-id
vector, then k-1 streaming passes each pick the point farthest from
the chosen set (per-block argmax partials, driver max; ties break to
the smaller id). No RNG, so seeding is identical on any cluster shape
and seeds are guaranteed to spread across blobs (a smallest-k-ids
init can land every seed inside one cluster). Determinism caveat: the
M-step's float64 partial sums fold in block order, so centroids across
DIFFERENT cluster shapes agree only to last ulps — a knife-edge point
equidistant to two centroids below that noise could flip assignment
(tests compare at 6 dp).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data


def kmeans_fit(
    ds: "ray.data.Dataset",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    n_iters: int = 20,
    tol: float = 1e-6,
) -> tuple[np.ndarray, float]:
    """Returns (centroids [k x dim] float64, final inertia). Stops when
    every centroid moves less than ``tol`` (L2) or after n_iters."""
    from . import topk

    first = topk.topk(
        ds.map_batches(lambda b: b[[id_col, vec_col]], batch_format="pandas"),
        sort_cols=[id_col],
        k=1,
        descending=False,
    ).to_pandas()
    if len(first) == 0:
        raise ValueError("kmeans_fit: input dataset is empty")
    cent = np.stack(first[vec_col].to_numpy()).astype(np.float64)

    # farthest-point seeding: k-1 streaming argmax passes
    while len(cent) < k:
        ref0 = ray.put(cent)

        def far_partial(b: pd.DataFrame) -> pd.DataFrame:
            c = ray.get(ref0)
            if len(b) == 0:
                return pd.DataFrame(
                    {
                        id_col: pd.Series([], dtype="int64"),
                        "d2": pd.Series([], dtype="float64"),
                        vec_col: b[vec_col].iloc[:0],
                    }
                )
            mat = np.stack(b[vec_col].to_numpy()).astype(np.float64)
            d2 = (
                (mat * mat).sum(axis=1, keepdims=True)
                - 2.0 * (mat @ c.T)
                + (c * c).sum(axis=1)
            ).min(axis=1)
            # block argmax, smaller id on ties
            order = np.lexsort((b[id_col].to_numpy(), -d2))
            i = order[0]
            return pd.DataFrame(
                {
                    id_col: [b[id_col].iloc[i]],
                    "d2": [float(d2[i])],
                    vec_col: [b[vec_col].iloc[i]],
                }
            )

        cand = ds.map_batches(far_partial, batch_format="pandas").to_pandas()
        cand = cand.sort_values(["d2", id_col], ascending=[False, True])
        cent = np.concatenate(
            [cent, np.asarray(cand[vec_col].iloc[0], dtype=np.float64)[None, :]]
        )

    inertia = float("inf")
    for _ in range(n_iters):
        ref = ray.put(cent)

        def estep(b: pd.DataFrame) -> pd.DataFrame:
            c = ray.get(ref)
            kk, d = c.shape
            if len(b) == 0:
                return pd.DataFrame(
                    {
                        "cid": pd.Series([], dtype="int64"),
                        "dim": pd.Series([], dtype="int64"),
                        "s": pd.Series([], dtype="float64"),
                        "n": pd.Series([], dtype="int64"),
                        "inertia": pd.Series([], dtype="float64"),
                    }
                )
            mat = np.stack(b[vec_col].to_numpy()).astype(np.float64)
            d2 = (
                (mat * mat).sum(axis=1, keepdims=True)
                - 2.0 * (mat @ c.T)
                + (c * c).sum(axis=1)
            )
            assign = d2.argmin(axis=1)
            sums = np.zeros((kk, d))
            np.add.at(sums, assign, mat)
            counts = np.bincount(assign, minlength=kk)
            part_inertia = float(d2[np.arange(len(mat)), assign].sum())
            out = pd.DataFrame(
                {
                    "cid": np.repeat(np.arange(kk, dtype=np.int64), d),
                    "dim": np.tile(np.arange(d, dtype=np.int64), kk),
                    "s": sums.ravel(),
                    "n": np.repeat(counts, d).astype("int64"),
                }
            )
            out["inertia"] = 0.0
            out.iloc[0, out.columns.get_loc("inertia")] = part_inertia
            return out

        parts = ds.map_batches(estep, batch_format="pandas").to_pandas()
        agg = parts.groupby(["cid", "dim"], as_index=False).agg(
            s=("s", "sum"), n=("n", "sum")
        )
        inertia = float(parts["inertia"].sum())
        new_cent = cent.copy()
        piv_s = agg.pivot(index="cid", columns="dim", values="s").to_numpy()
        piv_n = agg.pivot(index="cid", columns="dim", values="n").to_numpy()[:, 0]
        nonempty = piv_n > 0
        new_cent[nonempty] = piv_s[nonempty] / piv_n[nonempty, None]
        shift = float(np.sqrt(((new_cent - cent) ** 2).sum(axis=1)).max())
        cent = new_cent
        if shift < tol:
            break

    # one inertia-only pass against the RETURNED centroids: the loop's
    # inertia was measured against the pre-update model, so returning
    # it with new_cent would overstate by one M-step (stale-metric bug
    # caught in review; elbow/k selection needs the consistent pair)
    ref = ray.put(cent)

    def inertia_partial(b: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(ref)
        if len(b) == 0:
            return pd.DataFrame({"i": pd.Series([], dtype="float64")})
        mat = np.stack(b[vec_col].to_numpy()).astype(np.float64)
        d2 = (
            (mat * mat).sum(axis=1, keepdims=True)
            - 2.0 * (mat @ c.T)
            + (c * c).sum(axis=1)
        )
        return pd.DataFrame({"i": [float(d2.min(axis=1).sum())]})

    inertia = float(
        ds.map_batches(inertia_partial, batch_format="pandas").to_pandas()["i"].sum()
    )
    return cent, inertia


def kmeans_assign(
    ds: "ray.data.Dataset",
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "cluster",
) -> "ray.data.Dataset":
    """(id, cluster): nearest-centroid assignment, stateless."""
    ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(ref)
        if len(b) == 0:
            return pd.DataFrame(
                {id_col: b[id_col], out_col: pd.Series([], dtype="int64")}
            )
        mat = np.stack(b[vec_col].to_numpy()).astype(np.float64)
        d2 = (
            (mat * mat).sum(axis=1, keepdims=True)
            - 2.0 * (mat @ c.T)
            + (c * c).sum(axis=1)
        )
        return pd.DataFrame(
            {id_col: b[id_col].to_numpy(), out_col: d2.argmin(axis=1).astype("int64")}
        )

    return ds.map_batches(assign, batch_format="pandas")
