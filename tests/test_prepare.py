"""pipelines/prepare: the composed training-data flow writes
hive-partitioned output whose per-split contents agree with the
returned counters, and dedup/filters drop the right rows."""

import glob

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import ray.data

from matomo_log_analytics_ray.pipelines import prepare


def _docs():
    rng = np.random.default_rng(51)
    texts = []
    for i in range(300):
        # english-ish prose with stopwords => passes quality + langid
        words = rng.choice(
            ["the", "and", "of", "to", "data", "model", "train", "value"],
            size=rng.integers(20, 60),
        )
        texts.append(" ".join(words) + f" tail{i % 150}")
    # 150 exact duplicate pairs (i and i+150 share tail AND text when
    # words collide is unlikely; force exact dups explicitly)
    for i in range(50):
        texts[i + 250] = texts[i]
    df = pd.DataFrame({"doc_id": np.arange(300, dtype=np.int64), "text": texts})
    df.loc[290, "text"] = "!!! ??? ,,, ..."  # fails quality+langid
    return df


def test_prepare_counts_and_write(tmp_path):
    df = _docs()
    out_dir = str(tmp_path / "prepared")
    counts = prepare.prepare_training_data(
        ray.data.from_pandas(df).repartition(4), out_dir=out_dir
    )
    # written partitions match the counters
    files = glob.glob(f"{out_dir}/split=*/**/*.parquet", recursive=True)
    assert files
    written = pq.ParquetDataset(out_dir).read().to_pandas()
    written["split"] = written["split"].astype(str)  # hive col reads back categorical
    got = (
        written.groupby("split", as_index=False)
        .agg(n_docs=("doc_id", "size"), total_tokens=("n_tokens", "sum"))
        .sort_values("split")
        .reset_index(drop=True)
    )
    want = counts.sort_values("split").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"n_docs": "int64", "total_tokens": "int64"}), want
    )
    # dedup dropped the 49 surviving forced duplicates (doc 290's junk
    # overwrite un-duped one pair); the junk doc itself fails quality
    assert counts["n_docs"].sum() <= 300 - 49 - 1
    assert 290 not in written["doc_id"].tolist()
    kept_dups = [i for i in range(50) if i + 250 in written["doc_id"].tolist()]
    assert kept_dups == []  # min doc_id wins, the 250+ copy never survives


def test_compact_partitions_preserves_rows(tmp_path):
    from matomo_log_analytics_ray.control import lifecycle
    from matomo_log_analytics_ray.stages import route

    rng = np.random.default_rng(61)
    df = pd.DataFrame(
        {
            "sink": rng.choice(["a", "b"], size=4000),
            "x": np.arange(4000, dtype=np.int64),
        }
    )
    out = str(tmp_path / "routed")
    route.write_routed(ray.data.from_pandas(df).repartition(8), out)
    before = pq.ParquetDataset(out).read().to_pandas()
    n_files_before = len(glob.glob(f"{out}/sink=*/*.parquet"))
    stats = lifecycle.compact_partitions(out, target_rows_per_file=10_000)
    after = pq.ParquetDataset(out).read().to_pandas()
    n_files_after = len(glob.glob(f"{out}/sink=*/*.parquet"))
    assert n_files_after < n_files_before
    assert n_files_after == 2  # one compacted file per sink at this size
    pd.testing.assert_frame_equal(
        before.sort_values("x").reset_index(drop=True),
        after.sort_values("x").reset_index(drop=True),
    )
    assert all(b >= a for _, (b, a) in stats.items())
    # idempotent: a second compaction is a no-op
    stats2 = lifecycle.compact_partitions(out, target_rows_per_file=10_000)
    assert all(b == a for _, (b, a) in stats2.items())


def test_compact_then_append_then_recompact_keeps_all_rows(tmp_path):
    # regression: a second compaction after new files arrive must not
    # overwrite the first generation's output (reviewed data-loss bug)
    from matomo_log_analytics_ray.control import lifecycle
    from matomo_log_analytics_ray.stages import route

    out = str(tmp_path / "routed")
    df1 = pd.DataFrame({"sink": ["a"] * 30, "x": np.arange(30, dtype=np.int64)})
    route.write_routed(ray.data.from_pandas(df1).repartition(4), out)
    lifecycle.compact_partitions(out, target_rows_per_file=1000)
    # new files arrive in the same partition dir
    extra = pd.DataFrame(
        {"sink": ["a"] * 20, "x": np.arange(100, 120, dtype=np.int64)}
    )
    pdir = f"{out}/sink=a"
    extra.drop(columns=["sink"]).to_parquet(f"{pdir}/part-99999-00000.parquet", index=False)
    lifecycle.compact_partitions(out, target_rows_per_file=1000)
    rows = pq.ParquetDataset(out).read().to_pandas()
    assert sorted(rows["x"].tolist()) == sorted(
        list(range(30)) + list(range(100, 120))
    )


def test_prepare_near_dup_drops_cluster_members():
    """near_dup=True removes non-canonical near-duplicate cluster
    members on top of exact dedup (chain a~b, b~c collapses to one)."""
    base = (
        "the quick brown fox jumps over the lazy dog and runs to the "
        "data model to train the value of the day with more words"
    )
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(6, dtype=np.int64),
            "text": [
                base,
                base + " extra",          # near-dup of 0
                base + " extra extra",    # near-dup of 1 (chain)
                "a completely different document about the training of "
                "models and the values of data in the modern world today",
                base,                      # exact dup of 0
                "the third unrelated text with the usual stopwords and "
                "a long enough tail of words to pass the quality bar ok",
            ],
        }
    )
    ds = ray.data.from_pandas(docs).repartition(3)
    plain = prepare.prepare_training_data(ds)
    near = prepare.prepare_training_data(ds, near_dup=True, near_dup_threshold=0.7)
    # plain: exact dedup drops doc 4 only -> 5 docs; near-dup also
    # drops 1 and 2 (transitively clustered with 0) -> 3 docs
    assert int(plain["n_docs"].sum()) == 5
    assert int(near["n_docs"].sum()) == 3


def test_semi_join_path_guard():
    """The keep-set semi-join picks broadcast under the limit, join
    past it on a real cluster, and NEVER join below MIN_JOIN_CPUS
    (Dataset.join deadlocks at 2-3 CPUs — see prepare.MIN_JOIN_CPUS)."""
    assert prepare.semi_join_path(100, 1000, cpus=32) == "broadcast"
    assert prepare.semi_join_path(2000, 1000, cpus=32) == "join"
    assert prepare.semi_join_path(2000, 1000, cpus=2) == "broadcast"
    assert prepare.semi_join_path(2000, 1000, cpus=3) == "broadcast"
    assert prepare.semi_join_path(2000, 1000, cpus=4) == "join"


def test_prepare_join_path_matches_broadcast():
    """Forcing the hash-join fallback (broadcast_limit=0) on the 4-CPU
    test session returns identical counters to the broadcast path."""
    rng = np.random.default_rng(5)
    n = 4000
    texts = [
        " ".join(
            f"w{int(x)}" for x in rng.integers(0, 2000, 12)
        )
        + " the and is of to in"  # stopwords so langid != und
        for _ in range(n // 2)
    ]
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": texts + texts,  # every text duplicated once
        }
    )
    ds = ray.data.from_pandas(docs).repartition(4)
    bcast = prepare.prepare_training_data(ds)
    joined = prepare.prepare_training_data(ds, broadcast_limit=0)
    pd.testing.assert_frame_equal(
        bcast.sort_values("split").reset_index(drop=True),
        joined.sort_values("split").reset_index(drop=True),
    )
    assert int(bcast["n_docs"].sum()) == n // 2
