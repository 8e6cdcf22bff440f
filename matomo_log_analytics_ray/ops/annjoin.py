"""Embedding similarity JOIN: for every left-side vector, its top-k
nearest right-side vectors by cosine — the two-dataset ANN operator
behind semantic decontamination (nearest benchmark doc per training
doc), retrieval-augmented labeling and cross-corpus linking.

Ray Data has no similarity join; the scalable composition is
IVF-style co-partitioning (the same partitioning SemDeDup uses, see
ops/semdedup.py):

1. assign BOTH sides to their nearest centroid — stateless broadcast
   map, no shuffle;
2. ONE shuffle co-locates each cluster's left and right members
   (vectors ride as fixed-width float64 bytes — the measured-2x
   cheaper encoding for vector shuffles, ops/semdedup.py:77);
3. per cluster, one tiled L @ R.T with row-wise top-k — worker memory
   O(tile x cluster), never O(cluster^2).

nprobe is 1 by construction (each left vector searches only its own
cluster) — that is what makes the operator exactly SQL-replayable
with fixed centroids; recall/speed trades are the centroid count's
job, exactly as in IVF (ops/similarity.ivf_topk handles the
multi-probe single-query-set case).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data

from .semdedup import _normalize


def _assign_side(
    ds: "ray.data.Dataset",
    cent_ref: "ray.ObjectRef",
    side: str,
    id_col: str,
    vec_col: str,
    probes: int = 1,
) -> "ray.data.Dataset":
    """probes > 1 replicates each row into its ``probes`` nearest
    clusters (distance ties break to the lower cluster id — stable
    argsort — matching the SQL ROW_NUMBER probe convention)."""

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(cent_ref)
        if len(b) == 0:
            return pd.DataFrame(
                {
                    "_id": pd.Series([], dtype="int64"),
                    "_emb": pd.Series([], dtype=object),
                    "cluster": pd.Series([], dtype="int64"),
                    "side": pd.Series([], dtype=object),
                }
            )
        X = np.stack(b[vec_col].to_numpy()).astype(np.float64)
        d = -2.0 * (X @ c.T) + (c * c).sum(axis=1)[None, :]
        ids = b[id_col].to_numpy().astype(np.int64)
        blobs = [x.tobytes() for x in X]
        if probes <= 1:
            return pd.DataFrame(
                {
                    "_id": ids,
                    "_emb": blobs,
                    "cluster": d.argmin(axis=1).astype(np.int64),
                    "side": side,
                }
            )
        p = min(probes, d.shape[1])
        near = np.argsort(d, axis=1, kind="stable")[:, :p]
        rep = np.repeat(np.arange(len(b)), p)
        return pd.DataFrame(
            {
                "_id": ids[rep],
                "_emb": pd.Series(blobs, dtype=object).iloc[rep].to_numpy(),
                "cluster": near.ravel().astype(np.int64),
                "side": side,
            }
        )

    return ds.map_batches(assign, batch_format="pandas")


def ann_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    centroids: np.ndarray,
    k: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    tile: int = 4096,
    max_group: int | None = 100_000,
    probes: int = 1,
) -> "ray.data.Dataset":
    """(qid, nn_id, score, rank): for each left row, its top-k
    same-cluster right rows by cosine (score desc, nn_id asc ties).
    Left rows whose probed clusters hold no right member emit
    nothing.

    ``probes`` is the IVF recall knob: each left row searches its
    ``probes`` nearest clusters (replicated left rows — right vectors
    are never duplicated by probing).  A right vector lives in exactly
    one cluster, so candidates stay distinct and the cross-probe merge
    is an exact per-qid top-k over a (qid, nn_id, score) projection —
    two cheap extra sorts, no dedup pass.

    ``max_group`` is the skew valve: a cluster whose LEFT side exceeds
    it (centroid collapse, untrained centroids) is salted into
    ceil(n/max_group) subgroups — left rows split by id hash, right
    rows REPLICATED into every subgroup — so no single worker owns a
    giant cluster's whole matmul.  Results are identical (each left
    row still sees its cluster's full right side); the cost is
    m x |R_hot| extra right rows for hot clusters only."""
    cent = np.asarray(centroids, dtype=np.float64)
    ref = ray.put(cent)
    al = _assign_side(left, ref, "l", id_col, vec_col, probes=probes)
    ar = _assign_side(right, ref, "r", id_col, vec_col)

    if max_group is not None:
        al = al.materialize()  # reused by the count pass and the shuffle
        counts = (
            al.map_batches(
                lambda b: b.groupby("cluster", as_index=False).size(),
                batch_format="pandas",
            )
            .to_pandas()  # O(blocks x clusters) pre-reduced rows
            .groupby("cluster")["size"]
            .sum()
        )
        salts = {
            int(c): int(-(-n // max_group))
            for c, n in counts.items()
            if n > max_group
        }
    else:
        salts = {}

    if salts:
        mmax = max(salts.values()) + 1
        salt_ref = ray.put(salts)

        def salt_left(b: pd.DataFrame) -> pd.DataFrame:
            s = ray.get(salt_ref)
            m = b["cluster"].map(lambda c: s.get(int(c), 1)).to_numpy()
            out = b.copy()
            out["gkey"] = b["cluster"].to_numpy() * mmax + (
                b["_id"].to_numpy() % m
            )
            return out

        def salt_right(b: pd.DataFrame) -> pd.DataFrame:
            s = ray.get(salt_ref)
            m = b["cluster"].map(lambda c: s.get(int(c), 1)).to_numpy()
            idx = np.repeat(np.arange(len(b)), m)
            out = b.iloc[idx].copy()
            rep_salt = np.concatenate(
                [np.arange(mi, dtype=np.int64) for mi in m]
            ) if len(b) else np.array([], dtype=np.int64)
            out["gkey"] = out["cluster"].to_numpy() * mmax + rep_salt
            return out

        tagged = al.map_batches(salt_left, batch_format="pandas").union(
            ar.map_batches(salt_right, batch_format="pandas")
        )
        group_key = "gkey"
    else:
        tagged = al.union(ar)
        group_key = "cluster"

    def join_group(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "qid": pd.Series([], dtype="int64"),
                "nn_id": pd.Series([], dtype="int64"),
                "score": pd.Series([], dtype="float64"),
                "rank": pd.Series([], dtype="int64"),
            }
        )
        ls = g[g["side"] == "l"]
        rs = g[g["side"] == "r"].sort_values("_id")
        if len(ls) == 0 or len(rs) == 0:
            return empty
        dim = len(cent[0])
        L = _normalize(
            np.frombuffer(b"".join(ls["_emb"].tolist()), dtype=np.float64)
            .reshape(len(ls), dim)
        )
        R = _normalize(
            np.frombuffer(b"".join(rs["_emb"].tolist()), dtype=np.float64)
            .reshape(len(rs), dim)
        )
        lids = ls["_id"].to_numpy()
        rids = rs["_id"].to_numpy()
        kk = min(k, len(rs))
        out = []
        for lo in range(0, len(ls), tile):
            hi = min(lo + tile, len(ls))
            S = L[lo:hi] @ R.T  # (tile, n_right)
            # row-wise top-kk, ties by ascending rid: R is id-sorted,
            # and mergesort over -S is stable, so equal scores keep
            # ascending-id order
            ordr = np.argsort(-S, axis=1, kind="stable")[:, :kk]
            rows = np.repeat(np.arange(hi - lo), kk)
            cols = ordr.ravel()
            out.append(
                pd.DataFrame(
                    {
                        "qid": lids[lo:hi][rows],
                        "nn_id": rids[cols],
                        "score": S[rows, cols],
                        "rank": np.tile(np.arange(kk, dtype=np.int64), hi - lo),
                    }
                )
            )
        return pd.concat(out, ignore_index=True)

    out = tagged.groupby(group_key).map_groups(
        join_group, batch_format="pandas"
    )
    if probes <= 1:
        return out
    # cross-probe merge: exact per-qid top-k over the candidate
    # projection, then ROW_NUMBER for the rank column
    from .rank import grouped_rank
    from .topk import grouped_topk

    cand = out.select_columns(["qid", "nn_id", "score"])
    merged = grouped_topk(
        cand, ["qid"], ["score", "nn_id"], k, descending=[True, False]
    )
    ranked = grouped_rank(
        merged, ["qid"], ["score", "nn_id"], rank_col="_rn",
        descending=[True, False],
    )
    return ranked.map_batches(
        lambda b: pd.DataFrame(
            {
                "qid": b["qid"].to_numpy(),
                "nn_id": b["nn_id"].to_numpy(),
                "score": b["score"].to_numpy(),
                "rank": (b["_rn"].to_numpy() - 1).astype("int64"),
            }
        ),
        batch_format="pandas",
    )
