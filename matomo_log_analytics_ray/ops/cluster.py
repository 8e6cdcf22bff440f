"""Duplicate clustering: connected components over near-dup pairs.

The missing last step of a dedup pipeline — candidate/verified PAIRS
(from exact, minhash+LSH, simhash or embedding near-dup, ops/dedup.py
/ ops/similarity.py) are only edges; training-data dedup needs the
transitive closure (pair chains a-b, b-c mean a,c are the same
cluster), one canonical document per cluster, and a filtered corpus.

Algorithm: iterated SORT + per-block star contraction with
hash-to-min delivery — the house sort-and-run pattern applied to the
MapReduce connected-components problem (local contraction +
hash-to-min emission, cf. Rastogi et al. and the
large-star/small-star family):

* state is a Dataset of (node, lab) rows, read as undirected edges of
  a graph whose components are invariant across rounds;
* each round sorts by ``node`` (co-locating every row of a vertex) and
  each block runs a fully VECTORIZED in-block min-label contraction
  (numpy minimum-relaxation + pointer-jump loop, no Python pointer
  chasing), collapsing the entire in-block subgraph to its min id in
  one pass;
* each block emits one star row ``(x, root)`` per distinct id AND the
  reverse ``(root, x)`` — the hash-to-min subscription: the root's
  node-run carries its membership, so when the root itself later
  re-roots, the new root is re-delivered keyed AT every member (a
  stale pointer can never observe its target's re-rooting through
  sort co-location alone);
* block boundaries need no fat edge handling: a vertex split across
  two blocks gets a contracted row from each, co-located by the next
  sort. To kill the pathological recurring split, each block forwards
  its two boundary rows (first/last vertex, already contracted, <= 2
  rows per block) through a repartition(1) micro-merge that contracts
  them globally and re-injects the result;
* convergence: the round operator is deterministic and its fixpoint
  state reproduces itself exactly, so the stop rule is multiset
  stability of the state rows between consecutive rounds, checked by
  a tiny per-block (count, uint64 hash-sum) signature. At a fixpoint,
  along any chain of state rows adjacent rows share an id whose label
  must agree, so each component carries exactly one label — its min
  id (labels are component member ids and never increase). Rounds ~
  log of component spread.

The state is O(V+E) two-int64-column rows (the min id of a cluster
transiently holds its membership list — hash-to-min's known
O(cluster) hot-spot, spread across sorted blocks and fine for
near-dup cluster sizes) and is MATERIALIZED once per round — the
iterative-algorithm exception to the never-materialize rule (without
it the lazy lineage doubles per round). No joins, no groupby: one
range sort + one map + a tiny coalesce per round.

The reference's only dedup is insert-if-absent on file paths
(/root/reference/libs/lib_database.py:73-94, SURVEY.md D1); this
module generalizes its "first writer wins" to content-duplicate
clusters at corpus scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data

from . import dedup, hashing


from . import default_join_partitions as _default_partitions


def _contract(node: np.ndarray, lab: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Star-contract the (node, lab) edge list: returns (ids, roots)
    with one row per distinct id (root = min id of its component
    within this edge list). Fully vectorized: repeated
    minimum-relaxation + pointer jumping over local indices."""
    if len(node) == 0:
        return node, lab
    ids, inv = np.unique(np.concatenate([node, lab]), return_inverse=True)
    n = len(node)
    ni, li = inv[:n], inv[n:]
    L = np.arange(len(ids))
    while True:
        m = L.copy()
        np.minimum.at(m, ni, L[li])
        np.minimum.at(m, li, L[ni])
        m = np.minimum(m, m[m])  # pointer jump: L(L(u))
        if np.array_equal(m, L):
            break
        L = m
    while True:  # full path compression
        m = L[L]
        if np.array_equal(m, L):
            break
        L = m
    return ids, ids[L]


def _star_rows(ids: np.ndarray, roots: np.ndarray) -> pd.DataFrame:
    """Star rows (x, root) AND reverse rows (root, x): the reverse rows
    are the delivery-subscription list of hash-to-min — when the root
    itself later re-roots, its node-run carries every member as a lab,
    so the new root is re-delivered keyed AT each member. Without them
    a stale pointer (b -> x) could never observe x's later re-rooting
    (sort co-locates by node, and b's and x's rows sort arbitrarily
    far apart)."""
    m = ids != roots
    return pd.DataFrame(
        {
            "node": np.concatenate([ids, roots[m]]),
            "lab": np.concatenate([roots, ids[m]]),
        }
    )


def _round_block_fn(b: pd.DataFrame) -> pd.DataFrame:
    """One contraction round over a node-sorted block: emit star rows
    for every distinct id, plus the block's two boundary rows tagged
    for the global micro-merge."""
    if len(b) == 0:
        return pd.DataFrame(
            {
                "node": pd.Series([], dtype="int64"),
                "lab": pd.Series([], dtype="int64"),
                "kind": pd.Series([], dtype=object),
            }
        )
    node = b["node"].to_numpy()
    lab = b["lab"].to_numpy()
    ids, roots = _contract(node, lab)
    out = _star_rows(ids, roots)
    out["kind"] = "star"
    # boundary rows: the contracted rows of the block's first and last
    # vertex (a vertex split across blocks meets its other half in the
    # micro-merge even if the sort splits it the same way every round)
    bounds = np.unique(np.array([node[0], node[-1]]))
    sel = np.isin(ids, bounds)
    edge = pd.DataFrame({"node": ids[sel], "lab": roots[sel]})
    edge["kind"] = "edge"
    return pd.concat([out, edge], ignore_index=True)


def _merge_block_fn(b: pd.DataFrame) -> pd.DataFrame:
    """Global micro-merge of all boundary rows (O(blocks) input)."""
    if len(b) == 0:
        return pd.DataFrame(
            {
                "node": pd.Series([], dtype="int64"),
                "lab": pd.Series([], dtype="int64"),
            }
        )
    ids, roots = _contract(b["node"].to_numpy(), b["lab"].to_numpy())
    return _star_rows(ids, roots)


def _snapshot(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Materialize AND sever lineage. materialize() keeps the logical
    plan; an iterative union-per-round loop then builds a plan TREE
    that doubles every round (each round references the previous one
    twice), and the optimizer walk turns exponential — measured 0.5 s
    -> 35 s/round by round 11. Rebuilding from the materialized block
    refs gives a fresh O(1) plan at zero data cost."""
    mat = ds.materialize()
    return ray.data.from_arrow_refs(mat.to_arrow_refs())


def _multiset_signature(rows: "ray.data.Dataset") -> tuple[int, int]:
    """(count, order-independent uint64 hash-sum) of (node, lab) rows —
    the round-stability test. The fixpoint state reproduces itself
    exactly (deterministic kernels), so signature equality between
    consecutive rounds detects it; a collision between two DIFFERENT
    multisets would need the 64-bit mixed-hash sum to coincide
    (~2^-64, engineering-negligible)."""
    def part(b: pd.DataFrame) -> pd.DataFrame:
        h = hashing.mix(
            b["node"].to_numpy(dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            ^ hashing.mix(b["lab"].to_numpy(dtype=np.uint64))
        )
        return pd.DataFrame({"n": [np.int64(len(b))], "sig": [h.sum(dtype=np.uint64)]})

    parts = rows.map_batches(part, batch_format="pandas").to_pandas()
    if len(parts) == 0:
        return 0, 0
    total = int(parts["n"].sum())
    sig = int(np.sum(parts["sig"].to_numpy(dtype=np.uint64), dtype=np.uint64))
    return total, sig


def connected_components(
    pairs: "ray.data.Dataset",
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iters: int = 30,
    num_partitions: int | None = None,
    small_limit: int = 20_000_000,
) -> "ray.data.Dataset":
    """Cluster ids for every node that appears in a pair.

    Returns a Dataset with columns ``node`` (every distinct id in
    ``a_col``/``b_col``) and ``cluster_id`` (the minimum node id
    reachable through pair edges — one stable id per component).

    Adaptive like pipelines/prepare's keep-set filter: a pair set of
    <= ``small_limit`` rows (20M pairs = ~320 MB of int64, seconds of
    numpy) contracts in ONE task — identical kernel, identical
    result; the multi-round sort machinery is strictly for pair sets
    beyond a single worker's heap. Measured on this box: 21M-edge
    giant-component worst case = 1237 s distributed vs ~40 s
    single-task, so the crossover is far above this default.
    """
    if num_partitions is None:
        num_partitions = _default_partitions()

    def init(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "node": b[a_col].to_numpy(),
                "lab": b[b_col].to_numpy(),
            }
        )

    rows = _snapshot(
        pairs.map_batches(init, batch_format="pandas").repartition(num_partitions)
    )
    n_pairs = rows.count()
    if n_pairs == 0:
        return rows.map_batches(
            lambda b: b[["node", "lab"]].rename(columns={"lab": "cluster_id"}),
            batch_format="pandas",
        )
    if n_pairs <= small_limit:
        def solve(b: pd.DataFrame) -> pd.DataFrame:
            ids, roots = _contract(b["node"].to_numpy(), b["lab"].to_numpy())
            return pd.DataFrame({"node": ids, "cluster_id": roots})

        return rows.repartition(1).map_batches(solve, batch_format="pandas")

    prev = None
    for _ in range(max_iters):
        tagged = _snapshot(
            rows.sort("node").map_batches(_round_block_fn, batch_format="pandas")
        )
        stars = tagged.map_batches(
            lambda b: b[b["kind"] == "star"][["node", "lab"]],
            batch_format="pandas",
        )
        merged = (
            tagged.map_batches(
                lambda b: b[b["kind"] == "edge"][["node", "lab"]],
                batch_format="pandas",
            )
            .repartition(1)
            .map_batches(_merge_block_fn, batch_format="pandas")
        )
        rows = _snapshot(stars.union(merged).repartition(num_partitions))
        sig = _multiset_signature(rows)
        if sig == prev:
            break
        prev = sig

    # exactly one row per node (boundary vertices and merge re-emits
    # leave duplicate (node, lab) rows; labels are equal at fixpoint,
    # min is still taken for safety under max_iters truncation)
    out = dedup.sorted_group_first(
        rows.map_batches(lambda b: b[["node", "lab"]], batch_format="pandas"),
        ["node"],
        "lab",
    )
    return out.map_batches(
        lambda b: b.rename(columns={"lab": "cluster_id"}), batch_format="pandas"
    ).repartition(num_partitions)


def assign_clusters(
    docs: "ray.data.Dataset",
    pairs: "ray.data.Dataset",
    id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """(id, cluster_id) for EVERY doc; docs in no pair cluster alone.

    Left-outer hash join of the corpus ids against the component
    labels (the label table holds only nodes that appear in a pair —
    for near-dup workloads a small fraction of the corpus)."""
    if num_partitions is None:
        num_partitions = _default_partitions()
    labels = connected_components(pairs, num_partitions=num_partitions)
    joined = docs.select_columns([id_col]).join(
        labels,
        "left_outer",
        num_partitions=num_partitions,
        on=(id_col,),
        right_on=("node",),
    )

    def resolve(b: pd.DataFrame) -> pd.DataFrame:
        ids = b[id_col].to_numpy()
        lab = b["cluster_id"].to_numpy()
        return pd.DataFrame(
            {id_col: ids, "cluster_id": np.where(pd.isna(lab), ids, lab).astype(ids.dtype)}
        )

    return joined.map_batches(resolve, batch_format="pandas")


def keep_canonical(
    docs: "ray.data.Dataset",
    pairs: "ray.data.Dataset",
    id_col: str = "doc_id",
    broadcast_limit: int = 5_000_000,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Corpus minus non-canonical duplicates: one doc (the min id) per
    duplicate cluster, all non-duplicated docs untouched.

    The drop set is {node : cluster_id < node} — strictly the
    non-canonical members, typically far smaller than the corpus. When
    it fits driver memory it is broadcast once via ray.put and applied
    as a vectorized searchsorted anti-filter fused into the scan (no
    shuffle of the corpus); beyond ``broadcast_limit`` it falls back
    to a hash left_anti join."""
    labels = connected_components(pairs, num_partitions=num_partitions)
    drop = labels.map_batches(
        lambda b: b[b["cluster_id"] < b["node"]][["node"]], batch_format="pandas"
    ).materialize()

    if drop.count() <= broadcast_limit:
        ids = np.sort(
            drop.to_pandas()["node"].to_numpy()
            if drop.count()
            else np.array([], dtype=np.int64)
        )
        ref = ray.put(ids)

        def anti(b: pd.DataFrame) -> pd.DataFrame:
            arr = ray.get(ref)
            if len(arr) == 0:
                return b
            v = b[id_col].to_numpy()
            pos = np.searchsorted(arr, v)
            pos = np.minimum(pos, len(arr) - 1)
            return b[arr[pos] != v]

        return docs.map_batches(anti, batch_format="pandas")

    if num_partitions is None:
        num_partitions = _default_partitions()
    return docs.join(
        drop,
        "left_anti",
        num_partitions=num_partitions,
        on=(id_col,),
        right_on=("node",),
    )
