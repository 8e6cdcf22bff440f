"""Duplicate clustering: connected components over near-dup pairs.

The missing last step of a dedup pipeline — candidate/verified PAIRS
(from exact, minhash+LSH, simhash or embedding near-dup, ops/dedup.py
/ ops/similarity.py) are only edges; training-data dedup needs the
transitive closure (pair chains a-b, b-c mean a,c are the same
cluster), one canonical document per cluster, and a filtered corpus.

Algorithm: alternating LARGE-STAR / SMALL-STAR rounds (Kiveris et
al., "Connected Components in MapReduce and Beyond"), each expressed
as the house sort-and-run pattern — one range sort by ``node`` + one
fully vectorized per-block kernel:

* state is a Dataset of directed (node, lab) edges whose components
  are invariant across rounds;
* LARGE-STAR: symmetrize the edges ((u,v) -> (u,v)+(v,u), self-loops
  dropped), sort by node, and per node-run emit ``(v, m)`` for every
  neighbor ``v > u`` where ``m = min(run's neighbors + u)`` — every
  strictly-larger neighbor re-points at the run's minimum. Output is
  ONE edge per undirected input edge, already oriented node > lab;
* SMALL-STAR: sort the (node > lab)-oriented edges by node; per run
  with neighbor set W and ``m = min(W)`` emit ``(w, m)`` for every
  ``w`` in ``W \\ {m}`` plus ``(u, m)`` — the smaller neighbors and u
  itself all re-point at the run minimum. Output rows <= input rows
  + one per run;
* a node-run SPLIT across blocks just yields fragment-local minima:
  every emitted edge still connects two nodes of the same component
  and every input edge still attaches its larger endpoint to a
  strictly smaller node, so components are preserved and progress
  continues (fragmentation only slows contraction by a round, never
  breaks it). No boundary side-channel is needed;
* convergence: labels never increase and the star state (every edge
  (v, component-min)) reproduces itself exactly under both kernels
  regardless of block splits, so the stop rule is multiset stability
  of the state between consecutive rounds, checked by a tiny
  per-block (count, uint64 hash-sum) signature. Rounds are
  O(log^2 n) in theory, a handful in practice.

Unlike hash-to-min delivery (whose root run transiently carries the
whole cluster membership — O(cluster) state explosion on a giant
component, measured 1237 s at 21M adversarial edges), the state here
is bounded by 2|E| rows in EVERY round no matter the component
shape. State is MATERIALIZED once per kernel — the
iterative-algorithm exception to the never-materialize rule (without
it the lazy lineage doubles per round). No joins, no groupby: two
range sorts + two maps per round.

The reference's only dedup is insert-if-absent on file paths
(/root/reference/libs/lib_database.py:73-94, SURVEY.md D1); this
module generalizes its "first writer wins" to content-duplicate
clusters at corpus scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

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


_EMPTY_STATE = pa.table(
    {
        "node": pa.array([], type=pa.int64()),
        "lab": pa.array([], type=pa.int64()),
    }
)


def _edges_table(node: np.ndarray, lab: np.ndarray) -> "pa.Table":
    """Arrow (node, lab) edge table — all round kernels emit Arrow so
    the sorts/shuffles between rounds see clean, hashable schemas
    (a pandas block converts via from_pandas, whose b'pandas' footer
    metadata defeats Ray's schema-dedup fast path)."""
    return pa.table(
        {
            "node": pa.array(node, type=pa.int64()),
            "lab": pa.array(lab, type=pa.int64()),
        }
    )


def _col(t: "pa.Table", name: str) -> np.ndarray:
    return t.column(name).to_numpy(zero_copy_only=False)


def _dedupe_pairs(node: np.ndarray, lab: np.ndarray) -> "pa.Table":
    """Within-block (node, lab) dedup — opportunistic, keeps duplicate
    edges from compounding across rounds."""
    if len(node) == 0:
        return _EMPTY_STATE
    order = np.lexsort((lab, node))
    n, l = node[order], lab[order]
    keep = np.ones(len(n), dtype=bool)
    keep[1:] = (n[1:] != n[:-1]) | (l[1:] != l[:-1])
    return _edges_table(n[keep], l[keep])


def _runs(node: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(run starts, per-row run id) of a node-sorted array."""
    change = np.ones(len(node), dtype=bool)
    change[1:] = node[1:] != node[:-1]
    starts = np.flatnonzero(change)
    return starts, np.cumsum(change) - 1


def _symmetrize(b: "pa.Table") -> "pa.Table":
    """(u,v) -> (u,v) and (v,u); self-loops dropped."""
    node = _col(b, "node")
    lab = _col(b, "lab")
    m = node != lab
    node, lab = node[m], lab[m]
    return _edges_table(
        np.concatenate([node, lab]), np.concatenate([lab, node])
    )


def _large_star_block(b: "pa.Table") -> "pa.Table":
    """Large-star over a node-sorted block of symmetrized edges: every
    neighbor v > u re-points at m = min(run neighbors + u). Output is
    oriented node > lab."""
    if len(b) == 0:
        return _EMPTY_STATE
    node = _col(b, "node")
    lab = _col(b, "lab")
    starts, run_id = _runs(node)
    m = np.minimum(np.minimum.reduceat(lab, starts), node[starts])[run_id]
    sel = lab > node
    return _dedupe_pairs(lab[sel], m[sel])


def _small_star_block(b: "pa.Table") -> "pa.Table":
    """Small-star over a node-sorted block of (node > lab)-oriented
    edges: all smaller neighbors and u itself re-point at m = min(W)."""
    if len(b) == 0:
        return _EMPTY_STATE
    node = _col(b, "node")
    lab = _col(b, "lab")
    starts, run_id = _runs(node)
    run_min = np.minimum.reduceat(lab, starts)
    m = run_min[run_id]
    sel = lab != m
    return _dedupe_pairs(
        np.concatenate([lab[sel], node[starts]]),
        np.concatenate([m[sel], run_min]),
    )


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
    def part(b: "pa.Table") -> "pa.Table":
        h = hashing.mix(
            _col(b, "node").astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            ^ hashing.mix(_col(b, "lab").astype(np.uint64))
        )
        return pa.table(
            {
                "n": pa.array([len(b)], type=pa.int64()),
                "sig": pa.array([h.sum(dtype=np.uint64)], type=pa.uint64()),
            }
        )

    parts = rows.map_batches(part, batch_format="pyarrow").to_pandas()
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
    small_limit: int = 5_000_000,
) -> "ray.data.Dataset":
    """Cluster ids for every node that appears in a pair.

    Returns a Dataset with columns ``node`` (every distinct id in
    ``a_col``/``b_col``) and ``cluster_id`` (the minimum node id
    reachable through pair edges — one stable id per component).

    Adaptive like pipelines/prepare's keep-set filter: a pair set of
    <= ``small_limit`` rows contracts in ONE task (one vectorized
    numpy contraction — identical result); larger sets run the
    large-star/small-star rounds. Measured on this box (32 CPUs):
    16M-pair clique shape 14.1 s distributed vs 43.6 s single-task;
    21M-pair single-giant-component worst case 52.3 s distributed
    (vs 1237 s for the former hash-to-min rounds) — the distributed
    path wins from the low tens of millions of pairs, so the default
    crossover sits at 5M where round fixed costs still dominate.
    """
    if num_partitions is None:
        num_partitions = _default_partitions()

    def init(b: "pa.Table") -> "pa.Table":
        return _edges_table(_col(b, a_col), _col(b, b_col))

    rows = _snapshot(
        pairs.map_batches(init, batch_format="pyarrow").repartition(num_partitions)
    )
    n_pairs = rows.count()
    if n_pairs == 0:
        return rows.map_batches(
            lambda b: b.rename_columns(["node", "cluster_id"]),
            batch_format="pyarrow",
        )
    if n_pairs <= small_limit:
        def solve(b: "pa.Table") -> "pa.Table":
            ids, roots = _contract(_col(b, "node"), _col(b, "lab"))
            return pa.table(
                {
                    "node": pa.array(ids, type=pa.int64()),
                    "cluster_id": pa.array(roots, type=pa.int64()),
                }
            )

        return rows.repartition(1).map_batches(solve, batch_format="pyarrow")

    prev = None
    for _ in range(max_iters):
        # large-star: symmetrized edges, larger neighbors re-point at
        # the run min; output comes back oriented node > lab
        rows = _snapshot(
            rows.map_batches(_symmetrize, batch_format="pyarrow")
            .sort("node")
            .map_batches(_large_star_block, batch_format="pyarrow")
        )
        # small-star: smaller neighbors + the node re-point at min(W)
        rows = _snapshot(
            rows.sort("node").map_batches(_small_star_block, batch_format="pyarrow")
        )
        sig = _multiset_signature(rows)
        if sig == prev:
            break
        prev = sig

    # at the star fixpoint every lab is its component min, but root
    # nodes and isolated ids (self-pairs) carry no (node, lab) row of
    # their own — union an identity row per ORIGINAL id, then take the
    # per-node min (min also guards max_iters truncation)
    def identity_rows(t):
        # arrow in/out: the union partner (_snapshot) holds arrow
        # blocks — a mixed-block-type union poisons sort sampling, and
        # pyarrow keeps the id type intact even for empty blocks
        import pyarrow as pa
        import pyarrow.compute as pc

        col = pa.concat_arrays(
            [t[a_col].combine_chunks(), t[b_col].combine_chunks()]
        )
        u = pc.unique(col)
        return pa.table({"node": u, "lab": u})

    all_rows = rows.union(
        pairs.map_batches(identity_rows, batch_format="pyarrow")
    )
    out = dedup.sorted_group_first(all_rows, ["node"], "lab")
    return out.map_batches(
        lambda b: b.rename_columns(
            ["cluster_id" if c == "lab" else c for c in b.column_names]
        ),
        batch_format="pyarrow",
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

    def resolve(b: "pa.Table") -> "pa.Table":
        ids = b.column(id_col)
        lab = pc.coalesce(pc.cast(b.column("cluster_id"), ids.type), ids)
        return pa.table({id_col: ids, "cluster_id": lab})

    return joined.map_batches(resolve, batch_format="pyarrow")


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
        lambda b: b.filter(
            pc.less(b.column("cluster_id"), b.column("node"))
        ).select(["node"]),
        batch_format="pyarrow",
    ).materialize()
    return _drop_ids(docs, drop, id_col, broadcast_limit, num_partitions)


def keep_best(
    docs: "ray.data.Dataset",
    pairs: "ray.data.Dataset",
    priority_col: str,
    id_col: str = "doc_id",
    broadcast_limit: int = 5_000_000,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """keep_canonical with a PRIORITY policy: per duplicate cluster
    keep the member with the highest ``priority_col`` (ties by min
    id) instead of blindly the min id — e.g. keep the LONGEST document
    of a near-dup cluster (n_chars), the standard choice when shorter
    members are truncations of the canonical page.

    Scale shape: priorities are attached to the (small) label table by
    a hash join keyed on node — the corpus never shuffles; the
    per-cluster argmax runs through sorted_group_first on
    (cluster_id, -priority, node) (pre-reduced edge rows, hot-cluster
    safe); the final anti-filter is the shared broadcast / left_anti
    tail."""
    if num_partitions is None:
        num_partitions = _default_partitions()
    # repartition rebuilds the block list: sort/union stages inside
    # connected_components / sorted_group_first can emit schema-less
    # EMPTY blocks that map stages skip, and pyarrow's join errors
    # with "no match for key field on right side" when one reaches a
    # join partition (the NOTES landmine; label tables are small, so
    # the exchange is cheap)
    labels = connected_components(pairs, num_partitions=num_partitions).repartition(
        num_partitions
    )

    proj = docs.map_batches(
        lambda b: pa.table(
            {"node": b.column(id_col), "_prio": b.column(priority_col)}
        ),
        batch_format="pyarrow",
    )
    lab_pr = labels.join(
        proj, "inner", num_partitions=num_partitions, on=("node",)
    )

    from .dedup import sorted_group_first

    ranked = lab_pr.map_batches(
        lambda b: pa.table(
            {
                "cluster_id": b.column("cluster_id"),
                "_negp": pc.negate(b.column("_prio")),
                "node": b.column("node"),
            }
        ),
        batch_format="pyarrow",
    )
    best = sorted_group_first(ranked, ["cluster_id"], ["_negp", "node"])
    best = best.map_batches(
        lambda b: pa.table(
            {"cluster_id": b.column("cluster_id"), "best_node": b.column("node")}
        ),
        batch_format="pyarrow",
    ).repartition(num_partitions)  # drop sort/union schema-less empties
    drop = (
        labels.join(
            best, "inner", num_partitions=num_partitions, on=("cluster_id",)
        )
        .map_batches(
            lambda b: b.filter(
                pc.not_equal(b.column("node"), b.column("best_node"))
            ).select(["node"]),
            batch_format="pyarrow",
        )
        .materialize()
    )
    return _drop_ids(docs, drop, id_col, broadcast_limit, num_partitions)


def _drop_ids(
    docs: "ray.data.Dataset",
    drop: "ray.data.Dataset",
    id_col: str,
    broadcast_limit: int,
    num_partitions: int | None,
) -> "ray.data.Dataset":
    """Shared anti-filter tail: remove the (materialized) ``drop`` id
    set from the corpus — broadcast searchsorted when it fits, hash
    left_anti join beyond."""
    if drop.count() <= broadcast_limit:
        ids = np.sort(
            drop.to_pandas()["node"].to_numpy()
            if drop.count()
            else np.array([], dtype=np.int64)
        )
        ref = ray.put(ids)

        def anti(b: "pa.Table") -> "pa.Table":
            arr = ray.get(ref)
            if len(arr) == 0:
                return b
            v = b.column(id_col).to_numpy(zero_copy_only=False)
            pos = np.searchsorted(arr, v)
            pos = np.minimum(pos, len(arr) - 1)
            return b.filter(pa.array(arr[pos] != v))

        return docs.map_batches(anti, batch_format="pyarrow")

    if num_partitions is None:
        num_partitions = _default_partitions()
    return docs.join(
        # drop descends from sort/union stages: repartition rebuilds
        # the block list so no schema-less empty block reaches the
        # join aggregator (see keep_best)
        drop.repartition(num_partitions),
        "left_anti",
        num_partitions=num_partitions,
        on=(id_col,),
        right_on=("node",),
    )
