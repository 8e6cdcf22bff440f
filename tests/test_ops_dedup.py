"""Dedup families: exact, MinHash+LSH, SimHash, n-gram Jaccard."""

import numpy as np
import pandas as pd
import ray.data

from matomo_log_analytics_ray.ops import dedup


def _docs():
    base = (
        "the quick brown fox jumps over the lazy dog while the cat "
        "watches from the tall garden wall near the old oak tree"
    )
    near = base.replace("lazy dog", "sleepy dog")  # near-dup of base
    other = (
        "completely different content about distributed query engines "
        "processing parquet tables with vectorized batch kernels"
    )
    rows = [
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": base},          # exact dup of 1
        {"doc_id": 3, "text": near},          # near dup of 1
        {"doc_id": 4, "text": other},
        {"doc_id": 5, "text": other},         # exact dup of 4
        {"doc_id": 6, "text": "tiny"},
        {"doc_id": 7, "text": ""},
    ]
    return pd.DataFrame(rows)


def test_exact_dedup_keeps_min_id():
    ds = ray.data.from_pandas(_docs())
    kept = sorted(dedup.exact_dedup_keep_ids(ds).to_pandas()["doc_id"].tolist())
    assert kept == [1, 3, 4, 6, 7]

    groups = dedup.exact_dup_groups(ds).to_pandas()
    assert sorted(groups["n_dups"].tolist()) == [2, 2]


def test_minhash_lsh_finds_near_dups_not_distinct():
    df = _docs()
    ds = ray.data.from_pandas(df)
    cand = dedup.minhash_lsh_candidates(ds).to_pandas()
    pairs = set(map(tuple, cand[["id_a", "id_b"]].to_numpy()))
    assert (1, 2) in pairs  # exact dup always a candidate
    assert (1, 3) in pairs or (2, 3) in pairs  # near dup caught
    assert (1, 4) not in pairs and (3, 4) not in pairs  # distinct not paired

    sigs = dedup.minhash_signature_batch(df)
    est = dedup.estimate_jaccard_pairs(cand, sigs)
    exact_pair = est[(est["id_a"] == 1) & (est["id_b"] == 2)]
    assert float(exact_pair["est_jaccard"].iloc[0]) == 1.0


def test_minhash_signature_deterministic_and_shingle_sensitive():
    df = _docs()
    s1 = dedup.minhash_signature_batch(df)
    s2 = dedup.minhash_signature_batch(df.copy())
    for a, b in zip(s1["signature"], s2["signature"]):
        assert np.array_equal(a, b)
    # identical texts -> identical signatures
    assert np.array_equal(s1["signature"].iloc[0], s1["signature"].iloc[1])
    # different texts -> different signatures
    assert not np.array_equal(s1["signature"].iloc[0], s1["signature"].iloc[3])


def test_simhash_near_dup_distance():
    df = _docs()
    fp = dedup.simhash_batch(df)
    h = fp["simhash"].to_numpy(dtype=np.uint64)
    d_exact = dedup.hamming_distance(h[:1], h[1:2])[0]
    d_near = dedup.hamming_distance(h[:1], h[2:3])[0]
    d_far = dedup.hamming_distance(h[:1], h[3:4])[0]
    assert d_exact == 0
    assert d_near < d_far

    ds = ray.data.from_pandas(df)
    cand = dedup.simhash_candidates(ds).to_pandas()
    pairs = set(map(tuple, cand[["id_a", "id_b"]].to_numpy()))
    assert (1, 2) in pairs


def test_ngram_jaccard_verify():
    df = _docs()
    pairs = pd.DataFrame({"id_a": [1, 1, 1], "id_b": [2, 3, 4]})
    out = dedup.ngram_jaccard_verify(pairs, df, threshold=0.5)
    j12 = float(out.loc[0, "jaccard"])
    j13 = float(out.loc[1, "jaccard"])
    j14 = float(out.loc[2, "jaccard"])
    assert j12 == 1.0
    assert 0.5 < j13 < 1.0
    assert j14 < 0.1
    assert out["is_dup"].tolist() == [True, True, False]


def test_sorted_group_counts_and_first_match_pandas():
    import numpy as np
    import ray.data

    rng = np.random.default_rng(9)
    df = pd.DataFrame(
        {"k": rng.integers(0, 3000, 50_000), "v": rng.integers(0, 10**6, 50_000)}
    )
    ds = ray.data.from_pandas(df).repartition(7)
    got_n = (
        dedup.sorted_group_counts(ds, ["k"], "n").to_pandas()
        .sort_values("k").reset_index(drop=True)
    )
    want_n = df.groupby("k", as_index=False).size().rename(columns={"size": "n"})
    want_n["n"] = want_n["n"].astype("int64")
    assert got_n.equals(want_n.sort_values("k").reset_index(drop=True))
    got_f = (
        dedup.sorted_group_first(ds, ["k"], "v").to_pandas()
        .sort_values("k").reset_index(drop=True)
    )
    want_f = df.groupby("k", as_index=False)["v"].min()
    assert got_f.equals(want_f.sort_values("k").reset_index(drop=True))


def test_run_reduction_invariant_to_partitioning():
    import numpy as np
    import ray.data

    rng = np.random.default_rng(17)
    # heavy-tailed bucket sizes so some runs span whole blocks
    bucket = rng.zipf(1.5, size=20_000) % 500
    df = pd.DataFrame({"bkt": bucket, "doc_id": np.arange(20_000, dtype=np.int64)})
    results = []
    for parts in (1, 3, 16):
        ds = ray.data.from_pandas(df).repartition(parts)
        p = (
            dedup.bucket_pairs(ds, ["bkt"], "doc_id", max_bucket=32)
            .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
        )
        results.append(p)
    assert results[0].equals(results[1]) and results[1].equals(results[2])
    # and counts likewise
    counts = []
    for parts in (1, 3, 16):
        ds = ray.data.from_pandas(df).repartition(parts)
        c = (
            dedup.sorted_group_counts(ds, ["bkt"], "n")
            .to_pandas().sort_values("bkt").reset_index(drop=True)
        )
        counts.append(c[["bkt", "n"]])
    assert counts[0].equals(counts[1]) and counts[1].equals(counts[2])


def _docs_with_dups(n=60, seed=3):
    """Deterministic corpus: word-salad docs plus planted exact/near
    duplicates (last 6 docs perturb docs 0-5 by one word)."""
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(40)]
    texts = [
        " ".join(rng.choice(vocab, size=30)) for _ in range(n)
    ]
    for i in range(6):
        words = texts[i].split()
        words[5] = "zz"  # one-word perturbation -> high jaccard near-dup
        texts.append(" ".join(words))
    return pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})


def test_simhash_verified_pipeline_is_exact():
    """candidates -> distributed Hamming verify == brute-force all-pairs
    Hamming<=3 (the 4x16-bit chunk theorem guarantees coverage)."""
    import numpy as np
    import ray.data

    from matomo_log_analytics_ray.ops import dedup

    docs_df = _docs_with_dups()
    docs = ray.data.from_pandas(docs_df).repartition(3)
    cand = dedup.simhash_candidates(docs)
    got = dedup.simhash_hamming_verify_ds(cand, docs).to_pandas()
    got_pairs = set(zip(got["id_a"], got["id_b"]))

    fp = dedup.simhash_batch(docs_df)
    x = fp["simhash"].to_numpy(dtype=np.uint64)
    ids = fp["doc_id"].to_numpy()
    want = set()
    for i in range(len(x)):
        for j in range(i + 1, len(x)):
            if dedup.popcount64(np.array([x[i] ^ x[j]]))[0] <= 3:
                want.add((min(ids[i], ids[j]), max(ids[i], ids[j])))
    assert got_pairs == want
    assert (got["hamming"] <= 3).all()


def test_lsh_jaccard_verified_pipeline_matches_driver_verify():
    """distributed ngram_jaccard_verify_ds == the driver-side
    ngram_jaccard_verify on the same candidate set."""
    import ray.data

    from matomo_log_analytics_ray.ops import dedup

    docs_df = _docs_with_dups()
    docs = ray.data.from_pandas(docs_df).repartition(3)
    cand = dedup.minhash_lsh_candidates(docs)
    cand_df = cand.to_pandas()
    got = (
        dedup.ngram_jaccard_verify_ds(cand, docs, threshold=0.5)
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    want = dedup.ngram_jaccard_verify(cand_df, docs_df, threshold=0.5)
    want = (
        want[want["is_dup"]][["id_a", "id_b", "jaccard"]]
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    assert got["id_a"].tolist() == want["id_a"].tolist()
    assert got["id_b"].tolist() == want["id_b"].tolist()
    assert (got["jaccard"].round(9) == want["jaccard"].round(9)).all()


def test_incremental_dedup_both_drop_paths():
    """New ids drop when (a) key seen in corpus or (b) a smaller new
    id shares the key; survivors are exactly the fresh-key min-ids."""
    import numpy as np
    import pandas as pd
    import ray.data

    from matomo_log_analytics_ray.ops import dedup

    corpus = pd.DataFrame(
        {"doc_id": np.array([1, 2], dtype=np.int64),
         "text": ["seen one", "other text"]}
    )
    new = pd.DataFrame(
        {
            "doc_id": np.array([10, 11, 12, 13], dtype=np.int64),
            "text": [
                "seen one again",   # key "seen one" -> in corpus, drop
                "fresh pair a",     # key "fresh pair" -> keep (min id)
                "fresh pair b",     # same key, larger id -> drop
                "brand new doc",    # keep
            ],
        }
    )
    kept = (
        dedup.incremental_dedup_keep_ids(
            ray.data.from_pandas(new).repartition(2),
            ray.data.from_pandas(corpus),
            normalize=dedup.prefix_key(2),
        )
        .to_pandas()["doc_id"]
        .sort_values()
        .tolist()
    )
    assert kept == [11, 13], kept


def test_exact_dedup_distributed_combine_matches_adaptive():
    # combine_limit=0 forces the range-sort sorted_group_first path;
    # it must keep exactly the same min-id-per-text set as the
    # one-task combine.
    ds = ray.data.from_pandas(_docs()).repartition(3)
    small = sorted(dedup.exact_dedup_keep_ids(ds).to_pandas()["doc_id"].tolist())
    dist = sorted(
        dedup.exact_dedup_keep_ids(ds, combine_limit=0)
        .to_pandas()["doc_id"]
        .tolist()
    )
    assert small == dist == [1, 3, 4, 6, 7]
