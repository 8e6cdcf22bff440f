"""Property-based tests of the pure block kernels behind the
distributed ops: random inputs AND random block boundaries, verified
against brute-force scalar references. No Ray per example — these
exercise exactly the logic the partitioning-invariance tests sample at
a few fixed block counts.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from matomo_log_analytics_ray.ops import asof, heavyhitters, sessionize

# ---------------------------------------------------------------------------
# as-of forward-fill kernel
# ---------------------------------------------------------------------------

_rows = st.lists(
    st.tuples(
        st.integers(0, 3),          # key
        st.integers(0, 50),         # ts
        st.integers(0, 1),          # side (0 right, 1 left)
        st.integers(0, 5),          # tie
    ),
    min_size=1,
    max_size=60,
)


@settings(max_examples=150, deadline=None)
@given(_rows)
def test_resolve_sorted_matches_bruteforce(rows):
    df = pd.DataFrame(rows, columns=["k", "ts", "_side", "_tie"])
    df = df.sort_values(["k", "ts", "_side", "_tie"], kind="mergesort").reset_index(
        drop=True
    )
    matched, ffill, _ = asof._resolve_sorted(df, "k")
    k = df["k"].to_numpy()
    side = df["_side"].to_numpy()
    for i in range(len(df)):
        # brute force: latest prior row (any side==0) of the same key
        prior = [
            j for j in range(i + 1) if k[j] == k[i] and side[j] == 0 and j <= i
        ]
        if prior:
            assert matched[i] and ffill[i] == prior[-1]
        else:
            assert not matched[i]


# ---------------------------------------------------------------------------
# sessionize partial/stitch kernels under arbitrary block boundaries
# ---------------------------------------------------------------------------


def _scalar_sessions(df: pd.DataFrame, gap_s: float) -> pd.DataFrame:
    out = []
    for uid, g in df.sort_values(["user_id", "ts"]).groupby("user_id"):
        gap = g["ts"].diff().dt.total_seconds().fillna(0)
        sid = (gap > gap_s).cumsum()
        for idx, (_, sg) in enumerate(g.groupby(sid)):
            out.append((uid, idx, sg["ts"].min(), len(sg)))
    return pd.DataFrame(
        out, columns=["user_id", "session_idx", "session_start", "n_events"]
    )


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 10_000)),
        min_size=1,
        max_size=80,
    ),
    st.lists(st.integers(1, 79), max_size=6),
)
def test_session_partials_stitch_any_boundaries(rows, cuts):
    gap_s = 600.0
    df = pd.DataFrame(rows, columns=["user_id", "off"])
    df["ts"] = pd.Timestamp("2024-01-01") + pd.to_timedelta(df["off"], unit="s")
    df = df.drop(columns=["off"]).sort_values(["user_id", "ts"]).reset_index(drop=True)
    # random block boundaries over the sorted rows
    bounds = sorted({c for c in cuts if c < len(df)} | {0, len(df)})
    partials = []
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        blk = df.iloc[lo:hi]
        partials.append(
            sessionize._session_partials(
                blk["user_id"].to_numpy(),
                blk["ts"].reset_index(drop=True),
                gap_s,
            )
        )
    got = (
        sessionize._finalize(pd.concat(partials, ignore_index=True), gap_s)
        .sort_values(["user_id", "session_idx"])
        .reset_index(drop=True)
    )
    want = (
        _scalar_sessions(df, gap_s)
        .sort_values(["user_id", "session_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# ---------------------------------------------------------------------------
# Misra–Gries truncation guarantee under arbitrary chunking
# ---------------------------------------------------------------------------


@settings(max_examples=80, deadline=None)
@given(
    st.lists(st.integers(0, 15), min_size=1, max_size=300),
    st.lists(st.integers(1, 299), max_size=5),
    st.sampled_from([0.05, 0.1, 0.3]),
)
def test_mg_candidates_never_lose_a_heavy_hitter(values, cuts, phi):
    k = math.ceil(3.0 / phi)
    s = pd.Series(values)
    bounds = sorted({c for c in cuts if c < len(s)} | {0, len(s)})
    merged = []
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        merged.append(heavyhitters._truncate(s.iloc[lo:hi].value_counts(), k))
    summed = (
        pd.concat(merged).groupby(level=0).sum() if merged else pd.Series([])
    )
    candidates = set(heavyhitters._truncate(summed, k).index)
    threshold = math.ceil(phi * len(s))
    true_heavy = set(s.value_counts()[lambda v: v >= threshold].index)
    assert true_heavy <= candidates | set()


# ---------------------------------------------------------------------------
# connected-components contraction kernel (ops/cluster)
# ---------------------------------------------------------------------------

_edges = st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 30)),
    min_size=1,
    max_size=60,
)


@settings(max_examples=200, deadline=None)
@given(_edges)
def test_contract_matches_union_find(edges):
    from matomo_log_analytics_ray.ops import cluster

    a = np.array([e[0] for e in edges], dtype=np.int64)
    b = np.array([e[1] for e in edges], dtype=np.int64)
    ids, roots = cluster._contract(a, b)
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    want = {n: find(n) for n in parent}
    assert dict(zip(ids.tolist(), roots.tolist())) == want


# ---------------------------------------------------------------------------
# greedy packing kernel (ops/pack)
# ---------------------------------------------------------------------------

_sizes = st.lists(st.integers(1, 50), min_size=1, max_size=80)


@settings(max_examples=200, deadline=None)
@given(_sizes, st.integers(10, 120))
def test_greedy_boundaries_match_sequential(sizes, budget):
    from matomo_log_analytics_ray.ops import pack

    got = pack._greedy_boundaries(np.asarray(sizes, dtype=np.int64), budget)
    fill, p, want = 0, 0, []
    for i, s in enumerate(sizes):
        if i == 0:
            fill = s
        elif fill + s <= budget:
            fill += s
        else:
            p += 1
            fill = s
        want.append(p)
    assert got.tolist() == want


# ---------------------------------------------------------------------------
# rolling-hash windows (ops/substr): shift invariance + exactness
# ---------------------------------------------------------------------------

_texts = st.lists(
    st.text(alphabet="ab ", min_size=0, max_size=30), min_size=1, max_size=8
)


@settings(max_examples=150, deadline=None)
@given(_texts, st.integers(2, 6))
def test_window_hashes_equal_iff_substrings_equal(texts, w):
    from matomo_log_analytics_ray.ops import substr

    s = pd.Series(texts)
    h, offs = substr._window_hashes(s, w)
    # map every window hash back to its substring; equal substrings
    # must hash equal (tiny alphabet makes repeats common, exercising
    # the shift-invariance of the modular-inverse formulation)
    seen = {}
    for d in range(len(texts)):
        t = texts[d] or ""
        n_w = max(0, len(t) - w + 1)
        assert offs[d + 1] - offs[d] == n_w
        for i in range(n_w):
            sub = t[i : i + w]
            hv = int(h[offs[d] + i])
            if sub in seen:
                assert seen[sub] == hv
            else:
                seen[sub] = hv
