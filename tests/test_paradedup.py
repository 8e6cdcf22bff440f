"""ops/paradedup: paragraph windowing, distributed ordered concat, and
end-to-end paragraph dedup match pandas references across block
boundaries."""

import numpy as np
import pandas as pd
import ray.data

from matomo_log_analytics_ray.ops import paradedup


def _make_docs(n=80, seed=13):
    rng = np.random.default_rng(seed)
    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    shared = " ".join(rng.choice(vocab, size=10))  # a paragraph many docs repeat
    rows = []
    for i in range(n):
        words = list(rng.choice(vocab, size=int(rng.integers(5, 40))))
        text = " ".join(words)
        if i % 3 == 0:
            text = shared + " " + text
        rows.append((i, text))
    rows.append((n, ""))  # empty doc emits ONE '' paragraph (SQL
    rows.append((n + 1, ""))  # string_split semantics); the second
    # empty doc's '' paragraph is a repeat and drops in dedup
    return pd.DataFrame(rows, columns=["doc_id", "text"])


def _para_ref(df, w=10):
    out = []
    for _, r in df.iterrows():
        ws = r["text"].split(" ")  # ''.split(' ') == [''] — one window
        for i in range(0, len(ws), w):
            out.append((r["doc_id"], i // w, " ".join(ws[i : i + w])))
    return pd.DataFrame(out, columns=["doc_id", "idx", "para"])


def _dedup_ref(df, w=10):
    p = _para_ref(df, w).sort_values(["doc_id", "idx"])
    seen = set()
    keep = []
    for _, r in p.iterrows():
        if r["para"] not in seen:
            seen.add(r["para"])
            keep.append(r)
    k = pd.DataFrame(keep)
    return (
        k.groupby("doc_id")["para"]
        .agg(" ".join)
        .rename("text")
        .reset_index()
    )


def test_paragraph_rows_matches_reference():
    df = _make_docs()
    want = (
        _para_ref(df).sort_values(["doc_id", "idx"]).reset_index(drop=True)
    )
    got = (
        paradedup.paragraph_rows(ray.data.from_pandas(df).repartition(4))
        .to_pandas()
        .sort_values(["doc_id", "idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_grouped_concat_ordered_across_blocks():
    rng = np.random.default_rng(4)
    n = 500
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 20, size=n),
            "o": np.arange(n, dtype="int64"),
            "v": [f"w{i}" for i in range(n)],
        }
    )
    want = (
        df.sort_values(["k", "o"])
        .groupby("k")["v"]
        .agg(" ".join)
        .rename("text")
        .reset_index()
    )
    for nblocks in (1, 7):
        ds = ray.data.from_pandas(df.sample(frac=1, random_state=1)).repartition(
            nblocks
        )
        got = (
            paradedup.grouped_concat(ds, ["k"], "o", "v")
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_paragraph_dedup_matches_reference():
    df = _make_docs()
    want = _dedup_ref(df).sort_values("doc_id").reset_index(drop=True)
    for nblocks in (1, 5):
        ds = ray.data.from_pandas(df).repartition(nblocks)
        got = (
            paradedup.paragraph_dedup(ds)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_paragraph_dedup_drops_fully_duplicate_docs():
    df = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": ["a b c", "a b c"],  # doc 2 is one repeated paragraph
        }
    )
    got = paradedup.paragraph_dedup(ray.data.from_pandas(df)).to_pandas()
    assert got["doc_id"].tolist() == [1]
