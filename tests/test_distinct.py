"""ops/distinct: exact distinct counts equal pandas nunique on any
partitioning; the HLL sketch is partition-invariant and within its
theoretical error bound."""

import numpy as np
import pandas as pd
import ray.data

from matomo_log_analytics_ray.ops import distinct


def _make(n=20_000, n_groups=4, card=3_000, seed=13):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "g": rng.integers(0, n_groups, size=n),
            "v": rng.integers(0, card, size=n),
        }
    )


def test_exact_distinct_matches_pandas():
    df = _make()
    want = (
        df.groupby("g")["v"].nunique().rename("n_distinct").reset_index()
    )
    for nblocks in (1, 6):
        got = (
            distinct.distinct_counts(
                ray.data.from_pandas(df).repartition(nblocks), "g", "v"
            )
            .sort_values("g")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_hll_error_bound_and_partition_invariance():
    # 4096 registers -> ~1.6% typical error; assert a generous 5%
    df = _make(n=200_000, n_groups=3, card=40_000, seed=17)
    exact = df.groupby("g")["v"].nunique()
    ests = []
    for nblocks in (2, 9):
        got = (
            distinct.hll_distinct_counts(
                ray.data.from_pandas(df).repartition(nblocks), "g", "v"
            )
            .sort_values("g")
            .reset_index(drop=True)
        )
        ests.append(got)
    pd.testing.assert_frame_equal(ests[0], ests[1])  # deterministic
    for _, row in ests[0].iterrows():
        true = exact[row["g"]]
        assert abs(row["n_distinct_est"] - true) / true < 0.05


def test_hll_small_range_linear_counting():
    df = pd.DataFrame({"g": ["a"] * 500, "v": np.arange(50).repeat(10)})
    got = distinct.hll_distinct_counts(ray.data.from_pandas(df), "g", "v")
    assert abs(int(got["n_distinct_est"].iloc[0]) - 50) <= 2


def test_word_doc_freq_matches_pandas():
    from matomo_log_analytics_ray.ops import textstats

    rng = np.random.default_rng(21)
    vocab = np.array([f"w{i}" for i in range(200)])
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(3, 30)))
        for _ in range(400)
    ]
    df = pd.DataFrame({"doc_id": np.arange(400, dtype=np.int64), "text": texts})
    want = (
        df.assign(w=df["text"].str.lower().str.findall(r"[a-z0-9]+"))
        .explode("w")
        .drop_duplicates(["doc_id", "w"])
        .groupby("w")
        .size()
        .rename("n_docs")
        .reset_index()
        .rename(columns={"w": "word"})
        .sort_values(["n_docs", "word"], ascending=[False, True])
        .head(15)
        .reset_index(drop=True)
    )
    for nblocks in (1, 5):
        got = (
            textstats.word_doc_freq(
                ray.data.from_pandas(df).repartition(nblocks), k=15
            )
            .to_pandas()
            .sort_values(["n_docs", "word"], ascending=[False, True])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_profile_columns_nulls_and_partials():
    from matomo_log_analytics_ray.ops import profile

    df = pd.DataFrame(
        {"a": [1.0, None, 3.0, None, 10.0], "b": [5, 5, 5, 5, 5]}
    )
    got = (
        profile.profile_columns(
            ray.data.from_pandas(df).repartition(3), ["a", "b"]
        )
        .set_index("column")
    )
    assert got.loc["a", "n"] == 5 and got.loc["a", "n_null"] == 2
    assert got.loc["a", "min_v"] == 1.0 and got.loc["a", "max_v"] == 10.0
    assert got.loc["a", "sum_v"] == 14.0
    assert got.loc["b", "n_null"] == 0 and got.loc["b", "sum_v"] == 25.0


def test_unigram_lm_scores():
    from matomo_log_analytics_ray.ops import lmscore

    rng = np.random.default_rng(81)
    common = ["the", "data", "model", "train", "value", "and", "of"]
    texts = [" ".join(rng.choice(common, size=30)) for _ in range(200)]
    texts.append("zzqx vvkw qqpl mmtr xxyz")  # gibberish: all OOV-ish
    df = pd.DataFrame(
        {"doc_id": np.arange(201, dtype=np.int64), "text": texts}
    )
    outs = []
    for nblocks in (1, 6):
        got = (
            lmscore.unigram_logprob_scores(
                ray.data.from_pandas(df).repartition(nblocks), vocab_k=5
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        outs.append(got)
    pd.testing.assert_frame_equal(outs[0], outs[1])  # partition-invariant
    scores = outs[0].set_index("doc_id")["lm_score"]
    assert scores[200] < scores[:200].min()  # gibberish scores lowest


def test_bigram_lm_scores_reference_and_partitioning():
    """bigram_logprob_scores == plain-python replay of the documented
    interpolation; natural word order outscores shuffled order."""
    import numpy as np
    import pandas as pd
    import ray.data

    from matomo_log_analytics_ray.ops import lmscore

    rng = np.random.default_rng(9)
    pats = ["the model trains", "the data flows", "a value grows"]
    texts = [" ".join(rng.choice(pats, 4)) for _ in range(40)]
    texts.append("")            # no words -> floor
    texts.append("single")      # one word -> floor
    df = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})

    outs = []
    for parts in (1, 4):
        ds = ray.data.from_pandas(df).repartition(parts)
        outs.append(
            lmscore.bigram_logprob_scores(ds, vocab_k=50, lam=0.7)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])
    out = outs[0].set_index("doc_id")["lm2_score"]

    # reference replay
    import re
    from collections import Counter
    toks = [re.findall(r"[a-z0-9]+", t.lower()) for t in df["text"]]
    n = sum(len(t) for t in toks)
    uni = Counter(w for t in toks for w in t)
    vocab = dict(sorted(uni.items(), key=lambda kv: (-kv[1], kv[0]))[:50])
    bi = Counter(
        (a, b) for t in toks for a, b in zip(t, t[1:])
        if a in vocab and b in vocab
    )
    floor = np.log(0.3 / n)
    for i, t in enumerate(toks):
        pairs = list(zip(t, t[1:]))
        if not pairs:
            assert out[i] == round(floor, 6)
            continue
        terms = [
            np.log(
                0.7 * (bi.get((a, b), 0) / vocab[a] if a in vocab else 0.0)
                + 0.3 * (vocab.get(b, np.nan) / n if b in vocab else 1.0 / n)
            )
            for a, b in pairs
        ]
        assert abs(out[i] - np.mean(terms)) < 2e-6


def test_domain_kl_zero_for_identical_distribution():
    """A group with the exact corpus distribution has KL ~ 0; a skewed
    group is strictly positive. Partition-invariant."""
    import numpy as np
    import pandas as pd
    import ray.data

    from matomo_log_analytics_ray.ops import textstats

    # two groups, identical text multiset -> corpus mix == each group mix
    same = ["alpha beta gamma", "beta gamma delta"] * 10
    df_same = pd.DataFrame(
        {"source": ["a"] * 20 + ["b"] * 20, "text": same + same}
    )
    out = textstats.domain_kl_divergence(
        ray.data.from_pandas(df_same).repartition(3), group_col="source"
    )
    assert np.allclose(out["kl"].to_numpy(), 0.0, atol=1e-9)

    df_skew = pd.DataFrame(
        {
            "source": ["a"] * 20 + ["b"] * 20,
            "text": ["alpha alpha alpha"] * 20 + ["beta gamma delta"] * 20,
        }
    )
    outs = []
    for parts in (1, 4):
        outs.append(
            textstats.domain_kl_divergence(
                ray.data.from_pandas(df_skew).repartition(parts),
                group_col="source",
            )
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])
    assert (outs[0]["kl"] > 0.1).all()


def test_mutual_information_ranks_label_exclusive_words_first():
    import numpy as np
    import pandas as pd
    import ray.data

    from matomo_log_analytics_ray.ops import textstats

    df = pd.DataFrame(
        {
            "lang": ["en"] * 20 + ["de"] * 20,
            # 'shared' carries no label signal; exclusives carry max
            "text": ["hello shared world"] * 20 + ["hallo shared welt"] * 20,
        }
    )
    outs = []
    for parts in (1, 4):
        outs.append(
            textstats.mutual_information_terms(
                ray.data.from_pandas(df).repartition(parts),
                label_col="lang", top_m=10,
            )
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])
    out = outs[0].set_index("word")["mi"]
    assert out["hello"] > out["shared"] and out["hallo"] > out["shared"]
    assert abs(out["shared"]) < 1e-9  # no signal -> MI ~ 0
