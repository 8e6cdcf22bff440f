"""SemDeDup, JSON extraction, transition counts, daily resample."""

import numpy as np
import pandas as pd
import pytest
import ray
import ray.data

from matomo_log_analytics_ray.ops import semdedup


def _semdedup_reference(X, ids, centroids, threshold):
    """Plain numpy replay of the documented contract: drop v iff some
    smaller-id same-cluster u has cosine >= threshold."""
    X = X.astype(np.float64)
    d = ((X[:, None, :] - centroids[None, :, :]) ** 2).sum(-1)
    cl = d.argmin(1)
    n = np.linalg.norm(X, axis=1)
    n = np.where(n == 0, 1.0, n)
    Xn = X / n[:, None]
    order = np.argsort(ids)
    keep = np.ones(len(ids), dtype=bool)
    for a in range(len(ids)):
        for b in range(len(ids)):
            if ids[b] < ids[a] and cl[a] == cl[b] and Xn[a] @ Xn[b] >= threshold:
                keep[a] = False
    return cl, keep


def _mk_vectors(seed=7, n=60, dim=8):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, dim))
    # plant exact and near duplicates
    X[11] = X[3]                                # exact dup, same cluster
    X[27] = X[5] + rng.normal(scale=1e-3, size=dim)  # near dup
    return X


def test_semdedup_matches_reference_and_partitioning():
    X = _mk_vectors()
    ids = np.arange(len(X), dtype=np.int64)
    cent = np.eye(4, X.shape[1]) * 2.0
    ref_cl, ref_keep = _semdedup_reference(X, ids, cent, 0.95)
    df = pd.DataFrame({"vec_id": ids, "embedding": list(X)})
    for parts in (1, 5):
        ds = ray.data.from_pandas(df).repartition(parts)
        out = (
            semdedup.semdedup(ds, cent, threshold=0.95)
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        assert (out["cluster"].to_numpy() == ref_cl).all()
        assert (out["keep"].to_numpy() == ref_keep).all()
    assert not ref_keep.all()  # the planted dups actually drop


def test_semdedup_tiled_equals_untiled():
    X = _mk_vectors(seed=13, n=50)
    ids = np.arange(len(X), dtype=np.int64)
    cent = np.eye(3, X.shape[1]) * 2.0
    df = pd.DataFrame({"vec_id": ids, "embedding": list(X)})
    ds = ray.data.from_pandas(df).repartition(3)
    big = semdedup.semdedup(ds, cent, threshold=0.9, tile=4096).to_pandas()
    small = semdedup.semdedup(ds, cent, threshold=0.9, tile=2).to_pandas()
    big = big.sort_values("vec_id").reset_index(drop=True)
    small = small.sort_values("vec_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(big, small)


def test_semdedup_keeps_lowest_id_of_a_dup_group():
    X = np.ones((4, 4))
    X[2] *= 3.0  # same direction, cosine 1.0 with the others
    ids = np.array([9, 4, 7, 12], dtype=np.int64)
    cent = np.zeros((1, 4))
    df = pd.DataFrame({"vec_id": ids, "embedding": list(X)})
    out = (
        semdedup.semdedup(ray.data.from_pandas(df), cent, threshold=0.99)
        .to_pandas()
        .set_index("vec_id")["keep"]
    )
    assert out[4] and not out[7] and not out[9] and not out[12]


def test_event_transitions_match_pandas(tmp_path):
    rng = np.random.default_rng(3)
    n = 400
    ev = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 20, n),
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 10_000, n), unit="s"),
            "event_type": rng.choice(["a", "b", "c"], n),
            "props": [f'{{"k": {int(v)}}}' for v in rng.integers(0, 100, n)],
            "value": rng.normal(size=n),
        }
    )
    p = tmp_path / "events.parquet"
    ev.to_parquet(p)
    import __ray_entry__ as e

    out = e._q_event_transitions(str(tmp_path))
    ref = (
        ev.sort_values(["user_id", "ts", "event_id"])
        .assign(prev=lambda d: d.groupby("user_id")["event_type"].shift(1))
        .dropna(subset=["prev"])
        .groupby(["prev", "event_type"], as_index=False)
        .size()
        .rename(columns={"prev": "prev_type", "event_type": "next_type", "size": "n"})
        .sort_values(["prev_type", "next_type"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        out, ref.astype({"n": "int64"}), check_dtype=False
    )


def test_resample_daily_fills_gaps(tmp_path):
    ev = pd.DataFrame(
        {
            "event_id": [0, 1, 2],
            "user_id": [1, 1, 2],
            # a 3-day hole between the first and last day for type "a"
            "ts": pd.to_datetime(["2024-01-01", "2024-01-05", "2024-01-03"]),
            "event_type": ["a", "a", "b"],
            "props": ['{"k": 1}'] * 3,
            "value": [0.0, 0.0, 0.0],
        }
    )
    ev.to_parquet(tmp_path / "events.parquet")
    import __ray_entry__ as e

    out = e._q_resample_daily(str(tmp_path))
    # 2 types x 5 calendar days, zero-filled holes
    assert len(out) == 10
    assert out["n"].sum() == 3
    a = out[out["event_type"] == "a"].set_index("day")["n"]
    assert a["2024-01-03"] == 0 and a["2024-01-01"] == 1 and a["2024-01-05"] == 1


def test_json_props_agg(tmp_path):
    ev = pd.DataFrame(
        {
            "event_id": [0, 1, 2],
            "user_id": [1, 2, 3],
            "ts": pd.to_datetime(["2024-01-01"] * 3),
            "event_type": ["a", "a", "b"],
            "props": ['{"k": 10}', '{"k": 32}', '{"k": 5}'],
            "value": [0.0, 0.0, 0.0],
        }
    )
    ev.to_parquet(tmp_path / "events.parquet")
    import __ray_entry__ as e

    out = e._q_json_props_agg(str(tmp_path)).set_index("event_type")
    assert out.loc["a", "sum_k"] == 42 and out.loc["a", "n_events"] == 2
    assert out.loc["b", "avg_k"] == 5.0


def test_dsir_weights_match_reference(tmp_path):
    """dsir_weights == plain-python unigram log-ratio replay, and
    target-language docs outrank off-target ones on average."""
    import numpy as np
    import pandas as pd
    import ray.data

    from matomo_log_analytics_ray.ops import dsir

    rng = np.random.default_rng(5)
    en_words = ["the", "model", "trains", "data", "fast"]
    de_words = ["das", "modell", "lernt", "daten", "schnell"]
    rows = []
    for i in range(60):
        lang = "en" if i % 2 == 0 else "de"
        words = rng.choice(en_words if lang == "en" else de_words, 12)
        rows.append({"doc_id": i, "lang": lang, "text": " ".join(words)})
    df = pd.DataFrame(rows)
    ds = ray.data.from_pandas(df).repartition(4)
    out = (
        dsir.dsir_weights(ds, "lang", "en")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    # reference replay
    import re
    toks = [re.findall(r"[a-z0-9]+", t.lower()) for t in df["text"]]
    tgt = (df["lang"] == "en").to_numpy()
    n = sum(len(t) for t in toks)
    nt = sum(len(t) for t, g in zip(toks, tgt) if g)
    from collections import Counter
    c = Counter(w for t in toks for w in t)
    ct = Counter(w for t, g in zip(toks, tgt) if g for w in t)
    ratio = {
        w: (np.log(max(ct[w], 1) / nt) if ct[w] > 0 else np.log(1 / nt))
        - np.log(c[w] / n)
        for w in c
    }
    floor = np.log(1 / nt) - np.log(1 / n)
    ref = [
        np.mean([ratio.get(w, floor) for w in t]) if t else floor for t in toks
    ]
    assert np.allclose(out["dsir_weight"].to_numpy(), np.round(ref, 6), atol=2e-6)
    en_mean = out["dsir_weight"][tgt].mean()
    de_mean = out["dsir_weight"][~tgt].mean()
    assert en_mean > de_mean


def test_quality_deciles_exact_ntile(tmp_path):
    """Global NTILE(10) formula matches SQL semantics incl. uneven
    buckets (n % k != 0) and is partition-invariant."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(21)
    n = 47  # uneven: 7 buckets of 5, 3 of 4
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": [
                " ".join(rng.choice(["alpha", "beta", "gamma", "delta"], 6))
                for _ in range(n)
            ],
            "lang": "en",
            "source": "s",
            "n_chars": 10,
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet")
    import __ray_entry__ as e

    out = (
        e._q_quality_deciles(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    import duckdb

    con = duckdb.connect()
    con.register("documents", docs)
    ref = (
        con.execute(e.oracle_sql()["quality_deciles"])
        .fetchdf()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert (out["decile"].to_numpy() == ref["decile"].to_numpy()).all()
    sizes = out["decile"].value_counts()
    assert sizes.max() - sizes.min() <= 1 and len(sizes) == 10
