"""ops/pack: greedy sequence packing — parity with a sequential
reference under varied partitioning, oversized docs, budget
conservation per pack."""

import numpy as np
import pandas as pd
import ray.data

from matomo_log_analytics_ray.ops import pack


def _ref_pack(sizes, budget):
    packs, fill, p = [], 0, 0
    for i, s in enumerate(sizes):
        if i == 0:
            fill = s
        elif fill + s <= budget:
            fill += s
        else:
            p += 1
            fill = s
        packs.append(p)
    return packs


def test_pack_matches_sequential_reference():
    rng = np.random.default_rng(2)
    n = 2000
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "n_chars": rng.integers(50, 900, size=n).astype(np.int64),
        }
    )
    df.loc[17, "n_chars"] = 5000  # oversized: alone in its pack
    budget, shard_size = 2000, 64
    want = {}
    for shard, g in df.assign(shard=df.doc_id // shard_size).groupby("shard"):
        g = g.sort_values("doc_id")
        for did, p in zip(g["doc_id"], _ref_pack(g["n_chars"].tolist(), budget)):
            want[did] = (shard, p)
    for nblocks in (1, 7):
        ds = ray.data.from_pandas(df).repartition(nblocks)
        got = pack.pack_greedy(ds, budget=budget, shard_size=shard_size).to_pandas()
        assert len(got) == n
        for did, sh, p in zip(got["doc_id"], got["shard"], got["pack_idx"]):
            assert want[did] == (sh, p)


def test_pack_budget_conserved():
    rng = np.random.default_rng(4)
    df = pd.DataFrame(
        {
            "doc_id": np.arange(500, dtype=np.int64),
            "n_chars": rng.integers(100, 700, size=500).astype(np.int64),
        }
    )
    ds = ray.data.from_pandas(df).repartition(3)
    got = pack.pack_greedy(ds, budget=1500, shard_size=50).to_pandas()
    m = got.merge(df, on="doc_id")
    fills = m.groupby(["shard", "pack_idx"])["n_chars"].sum()
    # every pack respects the budget (no oversized docs in this input)
    assert (fills <= 1500).all()
    # greedy: consecutive packs cannot be merged (pack i full enough
    # that pack i+1's first doc would not fit)
    for (sh, p), g in m.sort_values("doc_id").groupby(["shard", "pack_idx"]):
        nxt = m[(m.shard == sh) & (m.pack_idx == p + 1)].sort_values("doc_id")
        if len(nxt):
            assert g["n_chars"].sum() + nxt["n_chars"].iloc[0] > 1500
