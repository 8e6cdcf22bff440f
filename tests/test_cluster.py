"""ops/cluster: connected components over dup pairs — correctness vs a
pure-Python union-find on random graphs, chain convergence (pointer
jumping), partition invariance, and the canonical-keep filter."""

import numpy as np
import pandas as pd
import ray.data

from matomo_log_analytics_ray.ops import cluster


def _uf_components(pairs: pd.DataFrame) -> dict:
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["id_a"], pairs["id_b"]):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_components_match_union_find_random_graph():
    rng = np.random.default_rng(7)
    pairs = pd.DataFrame(
        {
            "id_a": rng.integers(0, 400, size=300, dtype=np.int64),
            "id_b": rng.integers(0, 400, size=300, dtype=np.int64),
        }
    )
    pairs = pairs[pairs.id_a != pairs.id_b]
    want = _uf_components(pairs)
    ds = ray.data.from_pandas(pairs).repartition(5)
    # both the single-task fast path and the multi-round scale path
    # (forced via small_limit=0) must produce the identical labeling
    for small_limit in (2_000_000, 0):
        got = cluster.connected_components(ds, small_limit=small_limit).to_pandas()
        got_map = dict(zip(got["node"], got["cluster_id"]))
        assert got_map == want


def test_long_chain_converges():
    # a 32-node chain needs pointer jumping to converge in few rounds;
    # plain neighbor propagation would need 31
    n = 32
    pairs = pd.DataFrame(
        {
            "id_a": np.arange(n - 1, dtype=np.int64),
            "id_b": np.arange(1, n, dtype=np.int64),
        }
    )
    ds = ray.data.from_pandas(pairs).repartition(4)
    got = cluster.connected_components(ds, max_iters=10, small_limit=0).to_pandas()
    assert (got["cluster_id"] == 0).all()
    assert len(got) == n


def test_assign_and_keep_canonical():
    pairs = pd.DataFrame({"id_a": [3, 5], "id_b": [5, 9]})  # cluster {3,5,9}
    docs = ray.data.from_pandas(
        pd.DataFrame({"doc_id": np.arange(12, dtype=np.int64)})
    ).repartition(3)
    pds = ray.data.from_pandas(pairs)
    ac = cluster.assign_clusters(docs, pds).to_pandas()
    m = dict(zip(ac["doc_id"], ac["cluster_id"]))
    assert m[3] == m[5] == m[9] == 3
    assert all(m[i] == i for i in range(12) if i not in (5, 9))
    kept = sorted(cluster.keep_canonical(docs, pds).to_pandas()["doc_id"])
    assert kept == [i for i in range(12) if i not in (5, 9)]


def test_empty_pairs():
    empty = ray.data.from_pandas(
        pd.DataFrame({"id_a": pd.Series([], dtype="int64"), "id_b": pd.Series([], dtype="int64")})
    )
    out = cluster.connected_components(empty).to_pandas()
    assert len(out) == 0
    docs = ray.data.from_pandas(pd.DataFrame({"doc_id": np.arange(5, dtype=np.int64)}))
    kept = sorted(cluster.keep_canonical(docs, empty).to_pandas()["doc_id"])
    assert kept == [0, 1, 2, 3, 4]


def test_keep_best_prefers_high_priority_member():
    """keep_best keeps the max-priority member of each cluster (ties
    by min id); unpaired docs always survive. Both anti-filter paths
    (broadcast and left_anti join) agree."""
    import numpy as np
    import pandas as pd
    import ray.data

    from matomo_log_analytics_ray.ops import cluster

    docs = pd.DataFrame(
        {
            "doc_id": np.arange(6, dtype=np.int64),
            "prio": np.array([1, 9, 5, 7, 7, 2], dtype=np.int64),
        }
    )
    # clusters {0,1,2} (best: 1) and {3,4} (tie at 7 -> min id 3); 5 unpaired
    pairs = pd.DataFrame(
        {"id_a": np.array([0, 1, 3], dtype=np.int64),
         "id_b": np.array([1, 2, 4], dtype=np.int64)}
    )
    dds = ray.data.from_pandas(docs).repartition(2)
    pds = ray.data.from_pandas(pairs)
    for limit in (10**6, 0):
        kept = (
            cluster.keep_best(dds, pds, "prio", broadcast_limit=limit)
            .to_pandas()["doc_id"]
            .sort_values()
            .tolist()
        )
        assert kept == [1, 3, 5], kept
