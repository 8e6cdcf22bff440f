"""Degenerate-input sweep for the round-2 operators: empty and
single-row datasets must return empty/trivial results, not crash —
a pipeline over a sparse shard sees exactly these shapes."""

import numpy as np
import pandas as pd
import ray.data

from matomo_log_analytics_ray.ops import (
    asof,
    distinct,
    heavyhitters,
    quantiles,
    sessionize,
    topk,
)


def _empty_events():
    return pd.DataFrame(
        {
            "user_id": pd.Series([], dtype="int64"),
            "ts": pd.Series([], dtype="datetime64[us]"),
            "event_id": pd.Series([], dtype="int64"),
        }
    )


def _one_event():
    return pd.DataFrame(
        {
            "user_id": np.array([1], dtype=np.int64),
            "ts": [pd.Timestamp("2024-01-01")],
            "event_id": np.array([7], dtype=np.int64),
        }
    )


def test_asof_empty_and_single():
    for df in (_empty_events(), _one_event()):
        out = asof.asof_join(
            ray.data.from_pandas(df),
            ray.data.from_pandas(
                _empty_events().rename(columns={"event_id": "asof_event_id"})
            ),
            key_col="user_id", ts_col="ts",
            left_id="event_id", right_id="asof_event_id",
        ).to_pandas()
        assert len(out) == 0  # no right rows -> inner as-of is empty


def test_grouped_topk_empty_and_single():
    assert (
        len(
            topk.grouped_topk(
                ray.data.from_pandas(_empty_events()),
                key_cols=["user_id"], sort_cols=["ts", "event_id"], k=3,
            ).to_pandas()
        )
        == 0
    )
    one = topk.grouped_topk(
        ray.data.from_pandas(_one_event()),
        key_cols=["user_id"], sort_cols=["ts", "event_id"], k=3,
    ).to_pandas()
    assert one["event_id"].tolist() == [7]


def test_quantiles_empty_and_single():
    empty = quantiles.grouped_quantiles(
        ray.data.from_pandas(pd.DataFrame({"g": pd.Series([], dtype=object),
                                           "v": pd.Series([], dtype="float64")})),
        "g", "v", qs=(0.5,),
    )
    assert len(empty) == 0
    one = quantiles.grouped_quantiles(
        ray.data.from_pandas(pd.DataFrame({"g": ["a"], "v": [3.5]})),
        "g", "v", qs=(0.25, 0.9),
    )
    assert one["value"].tolist() == [3.5, 3.5]


def test_distinct_and_hll_empty_and_single():
    e = pd.DataFrame({"g": pd.Series([], dtype=object),
                      "v": pd.Series([], dtype="int64")})
    assert len(distinct.distinct_counts(ray.data.from_pandas(e), "g", "v")) == 0
    assert len(distinct.hll_distinct_counts(ray.data.from_pandas(e), "g", "v")) == 0
    s = pd.DataFrame({"g": ["x"], "v": [1]})
    assert distinct.distinct_counts(
        ray.data.from_pandas(s), "g", "v"
    )["n_distinct"].tolist() == [1]
    assert distinct.hll_distinct_counts(
        ray.data.from_pandas(s), "g", "v"
    )["n_distinct_est"].tolist() == [1]


def test_heavy_hitters_empty_and_single():
    e = pd.DataFrame({"v": pd.Series([], dtype="int64")})
    assert len(heavyhitters.heavy_hitters(ray.data.from_pandas(e), "v")) == 0
    s = pd.DataFrame({"v": np.array([5], dtype=np.int64)})
    out = heavyhitters.heavy_hitters(ray.data.from_pandas(s), "v", phi=0.5)
    assert out["v"].tolist() == [5] and out["n"].tolist() == [1]


def test_sessionize_empty_and_single():
    e = _empty_events()[["user_id", "ts"]]
    assert len(sessionize.sessionize(ray.data.from_pandas(e)).to_pandas()) == 0
    s = _one_event()[["user_id", "ts"]]
    out = sessionize.sessionize(ray.data.from_pandas(s)).to_pandas()
    assert out["n_events"].tolist() == [1] and out["session_idx"].tolist() == [0]


def test_window_rank_ops_empty_and_single():
    from matomo_log_analytics_ray.ops import rank, window

    for df in (_empty_events(), _one_event()):
        v = df.assign(value=np.ones(len(df)))
        ds = ray.data.from_pandas(v)
        got = rank.grouped_rank(ds, ["user_id"], ["ts", "event_id"]).to_pandas()
        assert len(got) == len(df)
        if len(df):
            assert got["rnk"].tolist() == [1]
        got = rank.grouped_cumsum(
            ds, ["user_id"], ["ts", "event_id"], "value"
        ).to_pandas()
        assert len(got) == len(df)
        got = window.grouped_lag(ds, ["user_id"], ["ts", "event_id"], "value").to_pandas()
        assert len(got) == len(df)
        if len(df):
            assert pd.isna(got["lag_val"].iloc[0])
        got = window.grouped_rolling_mean(
            ds, ["user_id"], ["ts", "event_id"], "value", window=3
        ).to_pandas()
        assert len(got) == len(df)


def test_pack_substr_tfidf_empty_and_single():
    from matomo_log_analytics_ray.ops import pack, substr, textstats

    empty_docs = pd.DataFrame(
        {"doc_id": pd.Series([], dtype="int64"), "text": pd.Series([], dtype=object)}
    )
    one_doc = pd.DataFrame({"doc_id": np.array([3], dtype=np.int64),
                            "text": ["one little document"]})
    for df in (empty_docs, one_doc):
        ds = ray.data.from_pandas(df)
        got = pack.pack_greedy(
            ds.map_batches(lambda b: b.assign(n_chars=b["text"].str.len().fillna(0).astype("int64")),
                           batch_format="pandas"),
            budget=100, shard_size=8,
        ).to_pandas()
        assert len(got) == len(df)
        got = substr.repeated_substring_docs(ds, w=10).to_pandas()
        assert len(got) == len(df)
        if len(df):
            assert got["n_shared_windows"].tolist() == [0]
        got = textstats.tfidf_top_terms(ds, k=3).to_pandas()
        assert len(got) == (0 if len(df) == 0 else 3)


def test_round3b_ops_empty_and_single():
    from matomo_log_analytics_ray.ops import funnel, paradedup, window

    empty_ev = pd.DataFrame(
        {
            "event_id": pd.Series([], dtype="int64"),
            "user_id": pd.Series([], dtype="int64"),
            "event_type": pd.Series([], dtype=object),
            "ts": pd.Series([], dtype="datetime64[us]"),
        }
    )
    one_ev = pd.DataFrame(
        {
            "event_id": np.array([1], dtype=np.int64),
            "user_id": np.array([5], dtype=np.int64),
            "event_type": ["signup"],
            "ts": [pd.Timestamp("2024-01-01")],
        }
    )
    for df in (empty_ev, one_ev):
        ds = ray.data.from_pandas(df)
        f = funnel.funnel_counts(ds, ["signup", "click"])
        assert f["users"].tolist() == ([1, 0] if len(df) else [0, 0])
        c = funnel.cohort_retention(ds).to_pandas()
        assert len(c) == len(df)
        d = funnel.debounce(ds, gap_us=1000).to_pandas()
        assert len(d) == len(df)
        r = window.rolling_window_distinct(ds, "user_id", "ts", 7).to_pandas()
        assert len(r) == (7 if len(df) else 0) or len(r) == len(df)

    empty_docs = pd.DataFrame(
        {
            "doc_id": pd.Series([], dtype="int64"),
            "text": pd.Series([], dtype=object),
        }
    )
    one_doc = pd.DataFrame({"doc_id": [3], "text": ["hello world"]})
    for df in (empty_docs, one_doc):
        ds = ray.data.from_pandas(df)
        out = paradedup.paragraph_dedup(ds).to_pandas()
        assert len(out) == len(df)


def test_annjoin_and_fuzzy_empty():
    from matomo_log_analytics_ray.ops import annjoin, fuzzyjoin

    empty_vec = pd.DataFrame(
        {
            "vec_id": pd.Series([], dtype="int64"),
            "embedding": pd.Series([], dtype=object),
        }
    )
    one_vec = pd.DataFrame({"vec_id": [1], "embedding": [np.ones(4)]})
    cent = np.eye(2, 4)
    out = annjoin.ann_join(
        ray.data.from_pandas(one_vec),
        ray.data.from_pandas(empty_vec),
        cent,
        max_group=None,
    ).to_pandas()
    assert len(out) == 0
    out = annjoin.ann_join(
        ray.data.from_pandas(one_vec),
        ray.data.from_pandas(one_vec),
        cent,
        max_group=None,
    ).to_pandas()
    assert len(out) == 1

    docs = pd.DataFrame({"doc_id": [1], "text": ["only one doc"]})
    out = fuzzyjoin.fuzzy_pairs(ray.data.from_pandas(docs)).to_pandas()
    assert len(out) == 0


def test_pair_verify_zero_candidates():
    """Single-doc corpora produce ZERO candidate pairs; every pair
    verification path must short-circuit instead of feeding a fully
    empty side to pyarrow's hash join (schema-less partitions)."""
    from matomo_log_analytics_ray.ops import dedup, similarity

    docs = ray.data.from_pandas(
        pd.DataFrame({"doc_id": [1], "text": ["solo document here"]})
    )
    out = dedup.ngram_jaccard_verify_ds(
        dedup.minhash_lsh_candidates(docs), docs, threshold=0.8
    ).to_pandas()
    assert len(out) == 0
    out = dedup.simhash_hamming_verify_ds(
        dedup.simhash_candidates(docs), docs
    ).to_pandas()
    assert len(out) == 0
    vecs = ray.data.from_pandas(
        pd.DataFrame({"vec_id": [1], "embedding": [np.ones(4)]})
    )
    pairs = ray.data.from_pandas(
        pd.DataFrame(
            {
                "id_a": pd.Series([], dtype="int64"),
                "id_b": pd.Series([], dtype="int64"),
            }
        )
    )
    out = similarity.verify_pairs_cosine(pairs, vecs, 0.5).to_pandas()
    assert len(out) == 0
