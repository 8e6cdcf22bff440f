"""ops/fuzzyjoin: banded Levenshtein equals the classic DP (capped),
and the blocked fuzzy self-join finds exactly the within-distance
pairs that share a prefix block."""

import numpy as np
import pandas as pd
import ray.data

from matomo_log_analytics_ray.ops import fuzzyjoin


def _lev(a, b):
    la, lb = len(a), len(b)
    d = list(range(lb + 1))
    for i in range(1, la + 1):
        prev = d[0]
        d[0] = i
        for j in range(1, lb + 1):
            cur = d[j]
            d[j] = min(d[j] + 1, d[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return d[lb]


def test_banded_levenshtein_fuzz():
    rng = np.random.default_rng(12)
    alpha = "abcd"
    for _ in range(800):
        a = "".join(
            alpha[i] for i in rng.integers(0, 4, size=int(rng.integers(0, 15)))
        )
        b = "".join(
            alpha[i] for i in rng.integers(0, 4, size=int(rng.integers(0, 15)))
        )
        for k in (0, 1, 3):
            t = _lev(a, b)
            want = t if t <= k else k + 1
            assert fuzzyjoin.banded_levenshtein(a, b, k) == want


def _make_docs():
    rows = [
        (0, "the quick brown fox jumps"),
        (1, "the quick brown fox jumped"),  # dist 1 vs doc 0
        (2, "the quick red fox jumps"),  # dist 4 vs doc 0 (brown->red)
        (3, "the quick brown cat sleeps"),  # far from 0 within block
        (4, "a completely different text"),
        (5, "a completely different texts"),  # dist 1 vs doc 4
        (6, "other block entirely here"),
    ]
    return pd.DataFrame(rows, columns=["doc_id", "text"])


def _reference(df, max_dist, prefix_words=2):
    pfx = df["text"].str.split(" ").str[:prefix_words].str.join(" ")
    out = []
    for i in range(len(df)):
        for j in range(i + 1, len(df)):
            if pfx.iloc[i] == pfx.iloc[j]:
                d = _lev(df["text"].iloc[i], df["text"].iloc[j])
                if d <= max_dist:
                    out.append(
                        (df["doc_id"].iloc[i], df["doc_id"].iloc[j], d)
                    )
    return sorted(out)


def test_fuzzy_pairs_matches_reference():
    df = _make_docs()
    for md in (1, 4):
        want = _reference(df, md)
        for nblocks in (1, 3):
            ds = ray.data.from_pandas(df).repartition(nblocks)
            got = (
                fuzzyjoin.fuzzy_pairs(ds, max_dist=md)
                .to_pandas()
                .sort_values(["id_a", "id_b"])
            )
            assert sorted(zip(got["id_a"], got["id_b"], got["dist"])) == want
