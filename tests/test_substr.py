"""ops/substr: exact repeated-substring detection — planted verbatim
repeats found at any alignment, short docs contribute nothing,
partition-invariant."""

import numpy as np
import pandas as pd
import ray.data

from matomo_log_analytics_ray.ops import substr


def test_planted_verbatim_repeat():
    shared = "the quick brown fox jumps over the lazy dog!"  # 45 chars
    df = pd.DataFrame(
        {
            "doc_id": np.arange(5, dtype=np.int64),
            "text": [
                "prefix padding " + shared + " suffix tail here",
                "Z" * 30 + shared,
                "a completely different document with no verbatim repeats "
                "of that length anywhere inside it at all, none",
                "tiny",  # shorter than w
                shared,  # the bare string, third copy
            ],
        }
    )
    for nblocks in (1, 4):
        ds = ray.data.from_pandas(df).repartition(nblocks)
        got = (
            substr.repeated_substring_docs(ds, w=40)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert len(got) == 5
        n = dict(zip(got["doc_id"], got["n_shared_windows"]))
        assert n[0] >= 5 and n[1] >= 5 and n[4] == 5  # 44-40+1 windows
        assert n[2] == 0 and n[3] == 0


def test_no_repeats_all_zero():
    rng = np.random.default_rng(6)
    alphabet = np.array(list("abcdefghijklmnopqrstuvwxyz "))
    texts = ["".join(rng.choice(alphabet, size=120)) for _ in range(40)]
    df = pd.DataFrame({"doc_id": np.arange(40, dtype=np.int64), "text": texts})
    got = substr.repeated_substring_docs(
        ray.data.from_pandas(df).repartition(3), w=40
    ).to_pandas()
    assert (got["n_shared_windows"] == 0).all()


def test_distributed_fallback_paths_match_adaptive():
    # broadcast_limit=0 forces every adaptive branch (one-task counts,
    # broadcast hit filter, one-task sums, broadcast zero-fill) onto
    # its distributed twin (range-sort counts, semi-join, sorted-run
    # sum, left_outer fill); results must be identical.
    shared = "the quick brown fox jumps over the lazy dog!"
    df = pd.DataFrame(
        {
            "doc_id": np.arange(5, dtype=np.int64),
            "text": [
                "prefix padding " + shared + " suffix tail here",
                "Z" * 30 + shared,
                "unique text with no long verbatim repeats of that "
                "window size anywhere within it at all, none",
                "tiny",
                shared,
            ],
        }
    )
    ds = ray.data.from_pandas(df).repartition(3)
    small = (
        substr.repeated_substring_docs(ds, w=40)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    dist = (
        substr.repeated_substring_docs(ds, w=40, broadcast_limit=0)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(small, dist)
