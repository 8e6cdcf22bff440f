"""Sequence packing: greedy in-order packing of documents into
fixed-budget training sequences.

The pretraining-data step that follows tokenization — concatenate
documents into sequences of at most ``budget`` tokens (a doc larger
than the budget sits alone in its own pack). Packing is greedy
first-fit IN ID ORDER within explicit shards (``shard = id //
shard_size``): real pipelines pack per shard anyway (cross-shard
packing would serialize the whole corpus), and the explicit shard key
makes the result deterministic and partition-invariant — unlike
packing per Ray block, whose boundaries change with cluster shape.

Shape: one range sort by (shard, id); shards fully interior to a block
pack in-block; rows of the (at most two) boundary shards per block are
forwarded — already just (shard, id, size) triples, O(shard_size) per
block — to a repartition(1) micro-merge that packs them identically.
The greedy kernel is vectorized per PACK, not per row: pack boundaries
are found by searchsorted on the running-size cumsum (a pack is the
maximal prefix fitting the budget), so the Python loop runs
O(#packs) times, not O(#docs).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data


def _greedy_boundaries(sizes: np.ndarray, budget: int) -> np.ndarray:
    """Pack index per element for greedy in-order packing: close the
    pack when the next element would overflow; an oversized element
    occupies its own pack. Vectorized per pack via cumsum +
    searchsorted."""
    n = len(sizes)
    packs = np.empty(n, dtype=np.int64)
    cs = np.cumsum(sizes, dtype=np.int64)
    start = 0
    pack = 0
    base = 0
    while start < n:
        # furthest element with cumulative size within budget
        end = int(np.searchsorted(cs, base + budget, side="right"))
        if end <= start:  # oversized element: alone in its pack
            end = start + 1
        packs[start:end] = pack
        pack += 1
        base = cs[end - 1]
        start = end
    return packs


def pack_greedy(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    size_col: str = "n_chars",
    budget: int = 2000,
    shard_size: int = 64,
) -> "ray.data.Dataset":
    """(id, shard, pack_idx): greedy packing of docs into sequences of
    at most ``budget`` total ``size_col``, per ``id // shard_size``
    shard, in ascending id order. pack_idx is 0-based within the
    shard."""

    def project(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                id_col: b[id_col].to_numpy(),
                "shard": b[id_col].to_numpy() // shard_size,
                "_sz": b[size_col].to_numpy(dtype=np.int64),
            }
        )

    rows = ds.map_batches(project, batch_format="pandas")
    sorted_ds = rows.sort(["shard", id_col])

    def pack_runs(b: pd.DataFrame) -> pd.DataFrame:
        n = len(b)
        if n == 0:
            return pd.DataFrame(
                {
                    id_col: pd.Series([], dtype="int64"),
                    "shard": pd.Series([], dtype="int64"),
                    "pack_idx": pd.Series([], dtype="int64"),
                    "kind": pd.Series([], dtype=object),
                }
            )
        sh = b["shard"].to_numpy()
        change = np.ones(n, dtype=bool)
        change[1:] = sh[1:] != sh[:-1]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], n)
        last = len(starts) - 1
        out_frames = []
        sizes = b["_sz"].to_numpy(dtype=np.int64)
        ids = b[id_col].to_numpy()
        for r in range(len(starts)):
            s, e = starts[r], ends[r]
            boundary = r == 0 or r == last
            if boundary:
                f = pd.DataFrame(
                    {id_col: ids[s:e], "shard": sh[s:e], "pack_idx": sizes[s:e]}
                )
                f["kind"] = "edge"  # pack_idx column carries _sz here
            else:
                f = pd.DataFrame(
                    {
                        id_col: ids[s:e],
                        "shard": sh[s:e],
                        "pack_idx": _greedy_boundaries(sizes[s:e], budget),
                    }
                )
                f["kind"] = "done"
            out_frames.append(f)
        return pd.concat(out_frames, ignore_index=True)

    tagged = sorted_ds.map_batches(pack_runs, batch_format="pandas").materialize()
    done = tagged.map_batches(
        lambda b: b[b["kind"] == "done"][[id_col, "shard", "pack_idx"]],
        batch_format="pandas",
    )

    def merge(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {
                    id_col: pd.Series([], dtype="int64"),
                    "shard": pd.Series([], dtype="int64"),
                    "pack_idx": pd.Series([], dtype="int64"),
                }
            )
        # rows arrive as (id, shard, _sz-in-pack_idx); re-sort and pack
        # each boundary shard whole
        b = b.sort_values(["shard", id_col], kind="mergesort")
        frames = []
        for sh_val, g in b.groupby("shard", sort=False):
            frames.append(
                pd.DataFrame(
                    {
                        id_col: g[id_col].to_numpy(),
                        "shard": sh_val,
                        "pack_idx": _greedy_boundaries(
                            g["pack_idx"].to_numpy(dtype=np.int64), budget
                        ),
                    }
                )
            )
        return pd.concat(frames, ignore_index=True)

    edges = (
        tagged.map_batches(
            lambda b: b[b["kind"] == "edge"][[id_col, "shard", "pack_idx"]],
            batch_format="pandas",
        )
        .repartition(1)
        .map_batches(merge, batch_format="pandas")
    )
    return done.union(edges)
