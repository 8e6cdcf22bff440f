"""Scale probe for the round-2 operators: run each over a 20M-row
synthetic events table (32 shards, /tmp cache) and print wall time +
throughput. Catches any shape that silently materializes or collapses
to the driver at volume — sf0.1 (100k rows) cannot.

Usage: python tools/scale_probe.py [n_rows]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from matomo_log_analytics_ray.io import read_parquet as _read_parquet  # noqa: E402

import numpy as np
import pandas as pd

SKEW = "--skew" in sys.argv
_args = [a for a in sys.argv[1:] if not a.startswith("--")]
N_ROWS = int(_args[0]) if _args else 20_000_000
N_SHARDS = 32
CACHE = f"/tmp/mla_ray/scale_probe_v1_{N_ROWS}{'_skew' if SKEW else ''}"


def _users(rng, per):
    if not SKEW:
        return rng.integers(0, 100_000, size=per)
    # Zipf-skewed keys: user 0 takes ~15% of ALL rows (a hot key
    # spanning every block after the range sort — the funnel case the
    # edge pre-reductions exist for), the rest Zipf over 100k users
    z = rng.zipf(1.3, size=per) % 100_000
    hot = rng.random(per) < 0.15
    z[hot] = 0
    return z.astype(np.int64)


def make_input() -> str:
    if os.path.isdir(CACHE) and len(os.listdir(CACHE)) == N_SHARDS:
        return CACHE
    os.makedirs(CACHE, exist_ok=True)
    rng = np.random.default_rng(0xABCD)
    per = N_ROWS // N_SHARDS
    base = pd.Timestamp("2024-01-01").value // 1000
    for s in range(N_SHARDS):
        ids = np.arange(s * per, (s + 1) * per, dtype=np.int64)
        df = pd.DataFrame(
            {
                "event_id": ids,
                "user_id": _users(rng, per),
                "ts": (base + rng.integers(0, 30 * 86400 * 10**6, size=per)).astype(
                    "datetime64[us]"
                ),
                "event_type": rng.choice(
                    np.array(["click", "purchase", "view", "error", "signup"]),
                    size=per,
                ),
                "value": rng.uniform(0, 100, size=per),
            }
        )
        df.to_parquet(f"{CACHE}/part-{s:03d}.parquet", index=False)
    return CACHE


ANN = "--ann" in sys.argv
ANN_ROWS = 1_000_000
ANN_DIM = 64
ANN_CACHE = f"/tmp/mla_ray/scale_probe_ann_v1_{ANN_ROWS}x{ANN_DIM}"


def make_ann_input() -> str:
    n_shards = 16
    if os.path.isdir(ANN_CACHE) and len(os.listdir(ANN_CACHE)) == n_shards:
        return ANN_CACHE
    os.makedirs(ANN_CACHE, exist_ok=True)
    rng = np.random.default_rng(0xE1B)
    per = ANN_ROWS // n_shards
    for s in range(n_shards):
        vecs = rng.normal(size=(per, ANN_DIM)).astype(np.float32)
        df = pd.DataFrame(
            {
                "vec_id": np.arange(s * per, (s + 1) * per, dtype=np.int64),
                "embedding": list(vecs),
            }
        )
        df.to_parquet(f"{ANN_CACHE}/part-{s:03d}.parquet", index=False)
    return ANN_CACHE


def main_ann() -> None:
    import ray
    import ray.data

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 log_to_driver=False)
    src = make_ann_input()
    from matomo_log_analytics_ray.ops import similarity

    rng = np.random.default_rng(7)
    qids = np.arange(4, dtype=np.int64)
    qvecs = rng.normal(size=(4, ANN_DIM))
    results = {}

    def timed(name, fn):
        t0 = time.monotonic()
        out = fn()
        results[name] = {
            "sec": round(time.monotonic() - t0, 2),
            "rows_out": int(len(out)),
            "vecs_per_sec": round(ANN_ROWS / (time.monotonic() - t0)),
        }
        print(f"{name}: {results[name]}", flush=True)

    def read():
        return _read_parquet(src)

    timed("brute_force_topk", lambda: similarity.brute_force_topk(
        read(), qids, qvecs, k=10))
    timed("ivf_topk_nprobe4", lambda: similarity.ivf_topk(
        read(), qids, qvecs, k=10, nlist=64, nprobe=4))
    timed("lsh_topk_10bit", lambda: similarity.lsh_topk(
        read(), qids, qvecs, k=10, n_bits=10))
    print(json.dumps({"n_vecs": ANN_ROWS, "dim": ANN_DIM, "results": results}))
    ray.shutdown()


TEXT = "--text" in sys.argv
TEXT_DOCS = 200_000


def main_text() -> None:
    """New-op probe over a 200k-doc corpus (datagen documents): the
    round-2 text/dedup additions at 2000x the sf0.01 gate volume."""
    import ray
    import ray.data

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 log_to_driver=False)
    from matomo_log_analytics_ray import datagen
    from matomo_log_analytics_ray.ops import (
        cluster, decontam, dedup, split, textclean, textstats,
    )

    dpath = datagen.documents_path(TEXT_DOCS)
    results = {}

    def timed(name, fn):
        t0 = time.monotonic()
        out = fn()
        n_out = len(out) if isinstance(out, pd.DataFrame) else out.count()
        results[name] = {
            "sec": round(time.monotonic() - t0, 2),
            "rows_out": int(n_out),
            "docs_per_sec": round(TEXT_DOCS / (time.monotonic() - t0)),
        }
        print(f"{name}: {results[name]}", flush=True)

    def rd():
        return _read_parquet(dpath)

    timed("tfidf_top_terms", lambda: textstats.tfidf_top_terms(rd(), k=5))
    timed("text_clean", lambda: rd().map_batches(
        textclean.clean_batch, batch_format="pandas"))
    timed("repetition", lambda: rd().map_batches(
        textstats.repetition_batch, batch_format="pandas"))
    def with_grp():
        return rd().map_batches(
            lambda b: b.assign(grp=(b["doc_id"] % 4).astype(str)),
            batch_format="pandas",
        )

    timed("rate_sample", lambda: split.rate_sample(
        with_grp(), "doc_id", "grp", {"0": 1.0, "1": 0.5}, default_rate=0.25))
    timed("decontaminate_1pct_bench", lambda: decontam.decontaminate(
        rd().map_batches(lambda b: b[b["doc_id"] % 100 != 0], batch_format="pandas"),
        rd().map_batches(lambda b: b[b["doc_id"] % 100 == 0], batch_format="pandas"),
    ))

    def clusters():
        docs = rd()
        cand = dedup.minhash_lsh_candidates(docs, max_bucket=4096)
        pairs = dedup.ngram_jaccard_verify_ds(cand, docs, threshold=0.8)
        return cluster.connected_components(pairs)

    timed("lsh_verify_cluster", clusters)

    from matomo_log_analytics_ray.ops import substr as substr_ops

    timed("repeated_substrings_w40", lambda: substr_ops.repeated_substring_docs(
        rd(), w=40))

    from matomo_log_analytics_ray.ops import colloc

    timed("pmi_collocations", lambda: colloc.pmi_collocations(
        rd(), min_count=5))

    from matomo_log_analytics_ray.ops import lmscore

    timed("bigram_lm_scores", lambda: lmscore.bigram_logprob_scores(rd()))

    def with_src():
        return rd().map_batches(
            lambda b: b.assign(source="src" + (b["doc_id"] % 20).astype(str)),
            batch_format="pandas",
        )

    timed("domain_kl", lambda: textstats.domain_kl_divergence(
        with_src(), group_col="source"))

    def keep_best_longest():
        docs = rd().map_batches(
            lambda b: b.assign(n_chars=b["text"].str.len().astype("int64")),
            batch_format="pandas",
        )
        cand = dedup.minhash_lsh_candidates(docs, max_bucket=4096)
        pairs = dedup.ngram_jaccard_verify_ds(cand, docs, threshold=0.8)
        return cluster.keep_best(docs, pairs, "n_chars")

    timed("keep_best_longest", keep_best_longest)

    timed("incremental_dedup_20pct_new", lambda: dedup.incremental_dedup_keep_ids(
        rd().map_batches(lambda b: b[b["doc_id"] % 5 == 0], batch_format="pandas"),
        rd().map_batches(lambda b: b[b["doc_id"] % 5 != 0], batch_format="pandas"),
        normalize=dedup.prefix_key(2),
    ))

    print(json.dumps({"n_docs": TEXT_DOCS, "num_cpus": 32, "results": results}))
    ray.shutdown()


DELTA = "--delta" in sys.argv


def main_delta() -> None:
    """Round-3 probe: upsert / snapshot_diff / pack_greedy over the
    20M-row events table (VERDICT r2 item 6). The delta/new side is a
    10% id slice with modified values, exercising BOTH upsert paths
    (broadcast anti-filter at 2M keys; forced hash left_anti via
    broadcast_limit=0) and the CDC full_outer classify."""
    import ray
    import ray.data

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 log_to_driver=False)
    src = make_input()
    from matomo_log_analytics_ray.ops import delta as delta_ops
    from matomo_log_analytics_ray.ops import pack as pack_ops

    results = {}

    def timed(name, fn):
        t0 = time.monotonic()
        out = fn()
        if isinstance(out, int):
            n_out = out
        elif isinstance(out, pd.DataFrame):
            n_out = len(out)
        else:
            n_out = out.count()
        results[name] = {
            "sec": round(time.monotonic() - t0, 2),
            "rows_out": int(n_out),
            "rows_per_sec": round(N_ROWS / (time.monotonic() - t0)),
        }
        print(f"{name}: {results[name]}", flush=True)

    def read():
        return _read_parquet(src, columns=["event_id", "user_id", "value"])

    def delta_side():
        # 10% of ids, values shifted (the upsert/CDC "new" rows)
        return read().map_batches(
            lambda b: b[b["event_id"] % 10 == 0].assign(value=lambda d: d["value"] + 1.0),
            batch_format="pandas",
        )

    timed("upsert_broadcast_10pct", lambda: delta_ops.upsert(
        read(), delta_side(), "event_id"))
    timed("upsert_join_10pct", lambda: delta_ops.upsert(
        read(), delta_side(), "event_id", broadcast_limit=0))
    timed("snapshot_diff_10pct", lambda: delta_ops.snapshot_diff(
        read(), delta_ops.upsert(read(), delta_side(), "event_id"),
        "event_id", ["value"]))
    timed("pack_greedy_b4000", lambda: pack_ops.pack_greedy(
        _read_parquet(src, columns=["event_id", "user_id"]).map_batches(
            lambda b: b.assign(n_chars=(b["user_id"] % 900 + 100).astype("int64")),
            batch_format="pandas",
        ),
        id_col="event_id", size_col="n_chars", budget=4000, shard_size=64,
    ).count())

    print(json.dumps({"n_rows": N_ROWS, "skew": SKEW, "num_cpus": 32,
                      "results": results}))
    ray.shutdown()


def main() -> None:
    import ray
    import ray.data

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 log_to_driver=False)
    src = make_input()
    from matomo_log_analytics_ray.ops import (
        asof, distinct, heavyhitters, quantiles, sessionize, topk,
    )

    results = {}

    def timed(name, fn):
        t0 = time.monotonic()
        out = fn()
        if isinstance(out, int):
            n_out = out
        elif isinstance(out, pd.DataFrame):
            n_out = len(out)
        else:
            n_out = out.count()
        results[name] = {
            "sec": round(time.monotonic() - t0, 2),
            "rows_out": int(n_out),
            "rows_per_sec": round(N_ROWS / (time.monotonic() - t0)),
        }
        print(f"{name}: {results[name]}", flush=True)

    def read():
        return _read_parquet(src)

    timed("asof_join_self", lambda: asof.asof_join_self(
        read(), key_col="user_id", ts_col="ts",
        left_mask=lambda b: b["event_type"] == "click",
        right_mask=lambda b: b["event_type"] == "purchase",
    ).to_pandas())
    timed("grouped_topk_k3", lambda: topk.grouped_topk(
        _read_parquet(src, columns=["user_id", "ts", "event_id"]),
        key_cols=["user_id"], sort_cols=["ts", "event_id"], k=3,
    ).to_pandas())
    timed("quantiles", lambda: quantiles.grouped_quantiles(
        _read_parquet(src, columns=["event_type", "value"]),
        "event_type", "value", qs=(0.25, 0.5, 0.75, 0.9),
    ))
    timed("distinct_exact", lambda: distinct.distinct_counts(
        _read_parquet(src, columns=["event_type", "user_id"]),
        "event_type", "user_id",
    ))
    timed("distinct_hll", lambda: distinct.hll_distinct_counts(
        _read_parquet(src, columns=["event_type", "user_id"]),
        "event_type", "user_id",
    ))
    timed("heavy_hitters", lambda: heavyhitters.heavy_hitters(
        _read_parquet(src, columns=["user_id"]), "user_id", phi=0.0001
    ))
    timed("sessionize_30min", lambda: sessionize.sessionize(
        _read_parquet(src, columns=["user_id", "ts"])
    ).count())
    from matomo_log_analytics_ray.ops import rank as rankmod
    from matomo_log_analytics_ray.ops import window as winmod

    timed("grouped_rank", lambda: rankmod.grouped_rank(
        _read_parquet(src, columns=["user_id", "ts", "event_id"]),
        ["user_id"], ["ts", "event_id"],
    ).count())
    timed("grouped_cumsum", lambda: rankmod.grouped_cumsum(
        _read_parquet(src, columns=["user_id", "ts", "event_id", "value"]),
        ["user_id"], ["ts", "event_id"], "value",
    ).count())
    timed("grouped_lag", lambda: winmod.grouped_lag(
        _read_parquet(src, columns=["user_id", "ts", "event_id", "value"]),
        ["user_id"], ["ts", "event_id"], "value",
    ).count())
    timed("rolling_mean_w3", lambda: winmod.grouped_rolling_mean(
        _read_parquet(src, columns=["user_id", "ts", "event_id", "value"]),
        ["user_id"], ["ts", "event_id"], "value", window=3,
    ).count())
    timed("range_join_1h", lambda: asof.range_join(
        _read_parquet(src, columns=["user_id", "ts", "event_id"]).map_batches(
            lambda b: b.rename(columns={"event_id": "click_id"}), batch_format="pandas"
        ),
        _read_parquet(src, columns=["user_id", "ts", "event_id"]).map_batches(
            lambda b: b.rename(columns={"event_id": "purchase_id"}), batch_format="pandas"
        ),
        key_col="user_id", point_ts="ts", point_id="click_id",
        ivl_start="ts", ivl_id="purchase_id", width_us=3600 * 1_000_000,
    ).count())

    print(json.dumps({"n_rows": N_ROWS, "num_cpus": 32, "results": results}))
    ray.shutdown()


NEWOPS = "--newops" in sys.argv


def main_newops() -> None:
    """Round-3 session probe: semdedup over the 1M x 64 ANN corpus
    (512 random centroids -> ~2k-vector clusters, the method's own
    partitioning) and dsir_weights over the 200k-doc corpus — the two
    newest ops at 2000x their gate volume."""
    import ray
    import ray.data

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 log_to_driver=False)
    results = {}

    def timed(name, denom, fn):
        t0 = time.monotonic()
        out = fn()
        n_out = len(out) if isinstance(out, pd.DataFrame) else out.count()
        dt = time.monotonic() - t0
        results[name] = {
            "sec": round(dt, 2),
            "rows_out": int(n_out),
            "items_per_sec": round(denom / dt),
        }
        print(f"{name}: {results[name]}", flush=True)

    ann_src = make_ann_input()
    rng = np.random.default_rng(0x5E0)
    cent = rng.normal(size=(512, ANN_DIM))
    from matomo_log_analytics_ray.ops import dsir, semdedup

    timed("semdedup_512c_t08", ANN_ROWS, lambda: semdedup.semdedup(
        _read_parquet(ann_src), cent, threshold=0.8))
    # NOT probed: a degenerate k=8 run (125k-vector clusters) is
    # ~8 TFLOP of within-cluster pair sims — the documented O((n/k)^2)
    # cost of underprovisioning k, bounded-memory (tiled) but hours
    # slow. SemDeDup's own remedy is larger k; the 512c row above is
    # the method's intended shape.

    from matomo_log_analytics_ray import datagen

    dpath = datagen.documents_path(TEXT_DOCS)

    def with_lang():
        return _read_parquet(dpath).map_batches(
            lambda b: b.assign(lang=np.where(b["doc_id"] % 3 == 0, "en", "de")),
            batch_format="pandas",
        )

    timed("dsir_weights", TEXT_DOCS, lambda: dsir.dsir_weights(
        with_lang(), "lang", "en"))

    print(json.dumps({"n_vecs": ANN_ROWS, "n_docs": TEXT_DOCS,
                      "num_cpus": 32, "results": results}))
    ray.shutdown()


ROUND3B = "--round3b" in sys.argv


def main_round3b() -> None:
    """Round-3 second-block probe: funnel / cohort / debounce over the
    20M-row events table and paragraph dedup over the 200k-doc corpus.
    Run with --skew to point the 15%-hot-user generator at the same
    ops (the funnel joins and per-(user,type) lag runs are the skew
    surfaces)."""
    import ray
    import ray.data

    src = make_input()
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 log_to_driver=False)
    from matomo_log_analytics_ray import datagen
    from matomo_log_analytics_ray.ops import funnel, paradedup

    results = {}

    def timed(name, denom, fn):
        t0 = time.monotonic()
        out = fn()
        n_out = len(out) if isinstance(out, pd.DataFrame) else out.count()
        dt = time.monotonic() - t0
        results[name] = {
            "sec": round(dt, 2),
            "rows_out": int(n_out),
            "items_per_sec": round(denom / dt),
        }
        print(f"{name}: {results[name]}", flush=True)

    def ev():
        return _read_parquet(src)

    timed("funnel_3step_12h", N_ROWS, lambda: funnel.funnel_counts(
        ev(), ["signup", "click", "purchase"],
        within_us=12 * 3600 * 1_000_000))
    timed("cohort_retention_30d", N_ROWS, lambda: funnel.cohort_retention(
        ev(), max_offset=30))
    timed("debounce_6h", N_ROWS, lambda: funnel.debounce(
        ev(), gap_us=6 * 3600 * 1_000_000))

    dpath = datagen.documents_path(TEXT_DOCS)
    timed("paragraph_dedup_w10", TEXT_DOCS, lambda: paradedup.paragraph_dedup(
        _read_parquet(dpath), para_words=10))

    print(json.dumps({"n_rows": N_ROWS, "n_docs": TEXT_DOCS, "skew": SKEW,
                      "num_cpus": 32, "results": results}))
    ray.shutdown()


ROUND3C = "--round3c" in sys.argv


def main_round3c() -> None:
    """Reproducible runs of the third-block manual probes: ann_join at
    1M x 64 (balanced data-sampled centroids AND adversarial collapsed
    centroids, salted), user co-occurrence with the blocking valve,
    and rank-and-select grouped median — the latter two over the 20M
    events table (add --skew for the hot-user leg)."""
    import glob

    import pyarrow.parquet as pq_

    import ray
    import ray.data

    ann_src = make_ann_input()
    ev_src = make_input()
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 log_to_driver=False)
    from matomo_log_analytics_ray.ops import annjoin, rank
    from matomo_log_analytics_ray.ops import default_join_partitions
    from matomo_log_analytics_ray.ops.dedup import (
        bucket_pairs, sorted_group_counts,
    )

    results = {}

    def timed(name, denom, fn):
        t0 = time.monotonic()
        out = fn()
        n_out = len(out) if isinstance(out, pd.DataFrame) else out.count()
        dt = time.monotonic() - t0
        results[name] = {"sec": round(dt, 2), "rows_out": int(n_out),
                         "items_per_sec": round(denom / dt)}
        print(f"{name}: {results[name]}", flush=True)

    f = sorted(glob.glob(f"{ann_src}/*.parquet"))[0]
    head = pq_.read_table(f).slice(0, 512)
    cent_good = np.stack(
        [np.asarray(v) for v in head["embedding"].to_pylist()]
    ).astype(np.float64)
    cent_bad = np.random.default_rng(0x5E0).normal(size=(512, ANN_DIM))

    def sides():
        ds = _read_parquet(ann_src)
        return (
            ds.map_batches(lambda b: b[b["vec_id"] % 20 != 0],
                           batch_format="pandas"),
            ds.map_batches(lambda b: b[b["vec_id"] % 20 == 0],
                           batch_format="pandas"),
        )

    l, r = sides()
    timed("ann_join_950k_data_centroids", ANN_ROWS, lambda: annjoin.ann_join(
        l, r, cent_good, k=1, max_group=50_000))
    l, r = sides()
    timed("ann_join_950k_collapsed_centroids", ANN_ROWS,
          lambda: annjoin.ann_join(l, r, cent_bad, k=1, max_group=50_000))

    ev = _read_parquet(ev_src)

    def cooc():
        def day_user(b):
            day = b["ts"].to_numpy(dtype="datetime64[us]").astype(
                "datetime64[D]")
            return pd.DataFrame(
                {"day": day.astype("int64"),
                 "user_id": b["user_id"].to_numpy()}
            ).drop_duplicates()

        pairs_in = sorted_group_counts(
            ev.map_batches(day_user, batch_format="pandas"),
            ["day", "user_id"],
        ).drop_columns(["n"])
        pairs = bucket_pairs(pairs_in, ["day"], "user_id", max_bucket=2000)
        return sorted_group_counts(pairs, ["id_a", "id_b"], alias="n_days")

    timed("user_cooccurrence_valve2000", N_ROWS, cooc)

    def median():
        np_join = default_join_partitions()
        r_ = rank.grouped_rank(
            ev, ["user_id"], ["value", "event_id"], rank_col="rnk"
        ).select_columns(["user_id", "value", "rnk"]).repartition(np_join)
        c_ = sorted_group_counts(
            ev.select_columns(["user_id"]), ["user_id"]
        ).repartition(np_join)
        j = r_.join(c_, "inner", num_partitions=np_join, on=("user_id",))

        def keep(b):
            want = (b["n"].to_numpy(dtype=np.int64) + 1) // 2
            m = b["rnk"].to_numpy(dtype=np.int64) == want
            return pd.DataFrame({"user_id": b["user_id"].to_numpy()[m]})

        return j.map_batches(keep, batch_format="pandas")

    timed("grouped_median_rank_select", N_ROWS, median)

    print(json.dumps({"n_rows": N_ROWS, "n_vecs": ANN_ROWS, "skew": SKEW,
                      "num_cpus": 32, "results": results}))
    ray.shutdown()


ROUND4 = "--round4" in sys.argv
ROUND5 = "--round5" in sys.argv


def main_round5() -> None:
    """Round-5 probes: (a) routed-write file-count before/after the
    opt-in compaction pass (VERDICT item 8 — the files = tasks x sinks
    trade made one flag away); (b) the broadcast verify path at a
    candidate volume near its limit (ngram_jaccard_verify_ds adaptive
    switch, VERDICT item 2's lever)."""
    import glob
    import shutil

    import ray
    import ray.data

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 log_to_driver=False)
    from matomo_log_analytics_ray import datagen
    from matomo_log_analytics_ray.control import lifecycle as gc
    from matomo_log_analytics_ray.pipelines import flagship

    results = {}
    out = "/tmp/mla_ray/probe_r5_routed"
    shutil.rmtree(out, ignore_errors=True)
    tpath = datagen.transcripts_shards_dir(4_000_000, n_shards=64)
    t0 = time.monotonic()
    flagship.run_flagship(tpath, out_dir=out)
    t_write = time.monotonic() - t0
    before = len(glob.glob(f"{out}/sink=*/*.parquet"))
    t0 = time.monotonic()
    stats = gc.compact_partitions(out, target_rows_per_file=1_000_000)
    t_compact = time.monotonic() - t0
    after = len(glob.glob(f"{out}/sink=*/*.parquet"))
    results["routed_write_compaction_4m"] = {
        "write_sec": round(t_write, 2),
        "compact_sec": round(t_compact, 2),
        "files_before": before,
        "files_after": after,
        "partitions": len(stats),
    }
    print(f"routed_write_compaction_4m: {results['routed_write_compaction_4m']}",
          flush=True)
    shutil.rmtree(out, ignore_errors=True)

    # (b) broadcast-verify near the adaptive limit: clone-heavy corpus
    # -> tens of thousands of candidate pairs, still broadcast-attached
    from matomo_log_analytics_ray.ops import dedup as dd

    rng = np.random.default_rng(7)
    # ~20k exact-clone groups of 2-3 members, each group's text drawn
    # independently (groups must NOT share shingles, or every clone
    # lands in one LSH bucket and the capped all-pairs explodes) ->
    # ~40k verified pairs, just under the 50k broadcast_pairs_limit
    # (the adaptive switch stays on the broadcast path at its worst
    # case)
    base = [
        " ".join(f"w{int(x)}" for x in rng.integers(0, 50_000, 40))
        for _ in range(20_000)
    ]
    texts, ids = [], []
    n_docs = 200_000
    for i in range(n_docs):
        ids.append(i)
        if i % 4 == 0:
            texts.append(base[(i // 4) % 20_000])
        else:
            texts.append(
                " ".join(f"w{int(x)}" for x in rng.integers(0, 50_000, 40))
            )
    docs = ray.data.from_pandas(
        [pd.DataFrame({"doc_id": ids[i:i + 25_000],
                       "text": texts[i:i + 25_000]})
         for i in range(0, n_docs, 25_000)]
    )
    t0 = time.monotonic()
    cand = dd.minhash_lsh_candidates(docs, max_bucket=4096)
    pairs = dd.ngram_jaccard_verify_ds(cand, docs, threshold=0.8)
    n = pairs.count()
    dt = time.monotonic() - t0
    results["broadcast_verify_200k_docs"] = {
        "sec": round(dt, 2), "verified_pairs": int(n),
        "docs_per_sec": round(n_docs / dt)}
    print(f"broadcast_verify_200k_docs: {results['broadcast_verify_200k_docs']}",
          flush=True)

    print(json.dumps({"num_cpus": 32, "results": results}))
    ray.shutdown()


SKEWJOIN = "--skewjoin" in sys.argv


def main_skewjoin() -> None:
    """Skew-join probe (run with --skewjoin --skew): 20M-row events
    with a 15%-hot user joined to a 100k-row dim table — plain
    Dataset.join (the hot key's ~3M rows land on ONE aggregator) vs
    ops/skewjoin.skew_join (heavy-hitter detect -> salt the hot rows
    over k_salts reduce partitions). Same row count out of both."""
    import ray
    import ray.data

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 log_to_driver=False)
    from matomo_log_analytics_ray.ops.skewjoin import skew_join

    src = make_input()
    dim = pd.DataFrame({
        "user_id": np.arange(100_000, dtype=np.int64),
        "seg": np.array([f"s{i % 7}" for i in range(100_000)], dtype=object),
    })
    dim_parts = [dim.iloc[i:i + 25_000] for i in range(0, 100_000, 25_000)]
    results = {}

    def left():
        return _read_parquet(src, columns=["user_id", "value"])

    def timed(name, fn):
        t0 = time.monotonic()
        n = fn()
        dt = time.monotonic() - t0
        results[name] = {"sec": round(dt, 2), "rows_out": int(n),
                         "rows_per_sec": round(N_ROWS / dt)}
        print(f"{name}: {results[name]}", flush=True)

    timed("plain_join_20m", lambda: left().join(
        ray.data.from_pandas(dim_parts), "inner",
        num_partitions=64, on=("user_id",)).count())
    timed("skew_join_20m", lambda: skew_join(
        left(), ray.data.from_pandas(dim_parts), on="user_id",
        k_salts=32, phi=0.01, num_partitions=64).count())

    print(json.dumps({"n_rows": N_ROWS, "skew": SKEW, "num_cpus": 32,
                      "results": results}))
    ray.shutdown()


def main_round4() -> None:
    """Round-4 probes: declarative validation with the fk_exists
    DISTRIBUTED path (broadcast_limit=0 forces the left_anti hash join;
    VERDICT item 6's 20M-child-row probe) plus the full rule list in
    one pass over the 20M events table."""
    import ray
    import ray.data

    src = make_input()
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 log_to_driver=False)
    from matomo_log_analytics_ray.ops import validate

    results = {}

    def timed(name, fn):
        t0 = time.monotonic()
        out = fn()
        dt = time.monotonic() - t0
        results[name] = {"sec": round(dt, 2), "rows_out": len(out),
                         "rows_per_sec": round(N_ROWS / dt)}
        print(f"{name}: {results[name]}  {out.to_dict('records')}", flush=True)

    # parent key set: 60% of the user range -> ~40% violations
    parents = ray.data.range(60_000).map_batches(
        lambda b: pd.DataFrame({"rk": b["id"].astype(np.int64)}),
        batch_format="pandas",
    )

    def child():
        return _read_parquet(src, columns=["user_id", "value", "event_type"])

    timed("fk_exists_distributed_20m", lambda: validate.validate(
        child(),
        [{"rule": "fk_exists", "col": "user_id", "ref": parents,
          "ref_col": "rk"}],
        broadcast_limit=0,
    ))
    timed("validate_full_rules_20m", lambda: validate.validate(
        child(),
        [
            {"rule": "not_null", "col": "value"},
            {"rule": "range", "col": "value", "lo": 0.0, "hi": 500.0},
            {"rule": "in_set", "col": "event_type",
             "values": ["click", "purchase", "view", "error", "signup"]},
            {"rule": "unique", "col": "user_id"},
            {"rule": "fk_exists", "col": "user_id", "ref": parents,
             "ref_col": "rk"},
        ],
    ))

    # --- decayed activity score at 20M rows (round-4 op) ---
    from matomo_log_analytics_ray.ops.groupagg import sorted_group_sum

    t_ref = np.datetime64("2024-02-01T00:00:00", "us")
    tau_us = 7.0 * 86400.0 * 1e6

    def decay_partials(b: pd.DataFrame) -> pd.DataFrame:
        dt_ = (t_ref - b["ts"].to_numpy(dtype="datetime64[us]")).astype(np.int64)
        w = b["value"].to_numpy(dtype=np.float64) * np.exp(-dt_ / tau_us)
        return (
            pd.DataFrame({"user_id": b["user_id"], "w": w})
            .groupby("user_id", as_index=False)["w"].sum()
        )

    def decay():
        ev = _read_parquet(src, columns=["user_id", "ts", "value"])
        return sorted_group_sum(
            ev.map_batches(decay_partials, batch_format="pandas"),
            ["user_id"], "w", alias="decay_score",
        ).materialize()

    t0 = time.monotonic()
    out = decay()
    dt = time.monotonic() - t0
    results["decayed_activity_20m"] = {
        "sec": round(dt, 2), "rows_out": out.count(),
        "rows_per_sec": round(N_ROWS / dt)}
    print(f"decayed_activity_20m: {results['decayed_activity_20m']}",
          flush=True)

    # --- real media decode throughput (built-in BMP/WAV codecs) ---
    from matomo_log_analytics_ray.ops import multimodal

    n_media = 100_000
    tbl = multimodal.generate_fake_media(n_media, seed=7)
    media = ray.data.from_arrow(tbl).repartition(32)

    t0 = time.monotonic()
    dims = multimodal.decode_dims(media, batch_size=256, concurrency=8)
    n_dec = dims.count()
    dt = time.monotonic() - t0
    results["media_decode_100k"] = {
        "sec": round(dt, 2), "rows_out": n_dec,
        "payloads_per_sec": round(n_media / dt)}
    print(f"media_decode_100k: {results['media_decode_100k']}", flush=True)

    t0 = time.monotonic()
    feats = multimodal.extract_features(
        media, batch_size=256, concurrency=8)
    n_f = feats.count()
    dt = time.monotonic() - t0
    results["media_features_100k"] = {
        "sec": round(dt, 2), "rows_out": n_f,
        "payloads_per_sec": round(n_media / dt)}
    print(f"media_features_100k: {results['media_features_100k']}",
          flush=True)

    # --- discovery manifest merge at ~1000x the testdata file count ---
    import shutil

    from matomo_log_analytics_ray.control import discovery

    n_files = 100_000
    listing = ray.data.range(n_files).map_batches(
        lambda b: pd.DataFrame({
            "path": [
                f"/logs/scl/2024-01-{(i % 28) + 1:02d}/scielo.br."
                f"{i}.log.gz" for i in b["id"].astype(np.int64)
            ]}),
        batch_format="pandas",
    )
    mdir = "/tmp/mla_ray/probe_manifest_r4"
    shutil.rmtree(mdir, ignore_errors=True)
    os.makedirs(mdir, exist_ok=True)

    def discover_merge():
        new_rows = discovery.build_manifest(listing, "scl")
        new_rows.write_parquet(mdir)  # distributed write, no driver concat
        return _read_parquet(mdir)

    t0 = time.monotonic()
    out = discover_merge()
    dt = time.monotonic() - t0
    results["discovery_manifest_100k_files"] = {
        "sec": round(dt, 2), "rows_out": out.count(),
        "files_per_sec": round(n_files / dt)}
    print("discovery_manifest_100k_files:"
          f" {results['discovery_manifest_100k_files']}", flush=True)

    # --- recovery replay at a 512k-row journal ---
    from matomo_log_analytics_ray.control import recovery

    rdir = "/tmp/mla_ray/probe_recovery_r4"
    shutil.rmtree(rdir, ignore_errors=True)
    os.makedirs(rdir, exist_ok=True)
    n_rows_j = 512_000
    per_f = n_rows_j // 64
    rng = np.random.default_rng(11)
    for f_i in range(64):
        pd.DataFrame({
            "partition_id": [f"p{f_i}_{j}" for j in range(per_f)],
            "total_lines": rng.integers(1, 10_000, per_f),
            "lines_parsed": rng.integers(0, 10_000, per_f),
            "status": rng.integers(0, 5, per_f),
        }).to_csv(f"{rdir}/recovery_{f_i}.tsv", sep="\t", header=False,
                  index=False)

    t0 = time.monotonic()
    df, _status = recovery.replay_recovery(rdir)
    dt = time.monotonic() - t0
    results["recovery_replay_512k"] = {
        "sec": round(dt, 2), "rows_out": len(df),
        "rows_per_sec": round(n_rows_j / dt)}
    print(f"recovery_replay_512k: {results['recovery_replay_512k']}",
          flush=True)

    # --- one-pass quantile sketch vs exact refinement at 20M rows ---
    from matomo_log_analytics_ray.ops import qsketch, quantiles

    def sk():
        return qsketch.quantile_sketch(
            _read_parquet(src, columns=["value"]), "value",
            qs=(0.5, 0.9, 0.99), k=4096)

    t0 = time.monotonic()
    est = sk()
    dt = time.monotonic() - t0
    results["quantile_sketch_20m"] = {
        "sec": round(dt, 2), "rows_out": len(est),
        "rows_per_sec": round(N_ROWS / dt)}
    print(f"quantile_sketch_20m: {results['quantile_sketch_20m']}"
          f"  {est.to_dict('records')}", flush=True)

    def exact():
        ev = _read_parquet(src, columns=["event_type", "value"]).map_batches(
            lambda b: b.assign(g=0), batch_format="pandas")
        return quantiles.grouped_quantiles(ev, "g", "value",
                                           qs=(0.5, 0.9, 0.99))

    t0 = time.monotonic()
    ex = exact()
    dt = time.monotonic() - t0
    results["quantile_exact_20m"] = {
        "sec": round(dt, 2), "rows_out": len(ex),
        "rows_per_sec": round(N_ROWS / dt)}
    print(f"quantile_exact_20m: {results['quantile_exact_20m']}"
          f"  {ex.to_dict('records')}", flush=True)

    print(json.dumps({"n_rows": N_ROWS, "skew": SKEW, "num_cpus": 32,
                      "results": results}))
    ray.shutdown()


CMS = "--cms" in sys.argv


def main_cms() -> None:
    """Count-min sketch probe (--cms [--skew]): 20M-row events — the
    one-scan grid sketch + 100k point estimates vs the exact per-key
    groupby count. Reports both wall times and the worst overshoot on
    the 100 hottest keys (must respect the one-sided 2N/w bound)."""
    import ray
    import ray.data

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 log_to_driver=False)
    from matomo_log_analytics_ray.ops import cms

    src = make_input()
    results = {}

    def rd():
        return _read_parquet(src, columns=["user_id"])

    t0 = time.monotonic()
    grid = cms.cms_sketch(rd(), "user_id", width=65536)
    keys = np.arange(100_000, dtype=np.int64)
    est = cms.cms_estimate(grid, pd.Series(keys))
    dt_cms = time.monotonic() - t0
    results["cms_sketch_20m"] = {
        "sec": round(dt_cms, 2), "rows_per_sec": round(N_ROWS / dt_cms),
        "grid_bytes": int(grid.nbytes)}
    print(f"cms_sketch_20m: {results['cms_sketch_20m']}", flush=True)

    t0 = time.monotonic()
    exact = (
        rd().groupby("user_id").count().to_pandas()
        .rename(columns={"count()": "n"})
    )
    dt_exact = time.monotonic() - t0
    results["exact_counts_20m"] = {
        "sec": round(dt_exact, 2), "rows_per_sec": round(N_ROWS / dt_exact)}
    print(f"exact_counts_20m: {results['exact_counts_20m']}", flush=True)

    exact = exact.sort_values("n", ascending=False).head(100)
    e = dict(zip(keys, est))
    overs = [int(e[int(k)]) - int(n) for k, n in zip(exact["user_id"], exact["n"])]
    assert min(overs) >= 0, "one-sided guarantee violated"
    results["top100_overshoot"] = {
        "max": max(overs), "bound_2n_over_w": round(2 * N_ROWS / 65536)}
    print(f"top100_overshoot: {results['top100_overshoot']}", flush=True)

    print(json.dumps({"n_rows": N_ROWS, "skew": SKEW, "num_cpus": 32,
                      "results": results}))
    ray.shutdown()


if __name__ == "__main__":
    if ANN:
        main_ann()
    elif TEXT:
        main_text()
    elif DELTA:
        main_delta()
    elif NEWOPS:
        main_newops()
    elif ROUND3B:
        main_round3b()
    elif ROUND3C:
        main_round3c()
    elif ROUND4:
        main_round4()
    elif ROUND5:
        main_round5()
    elif SKEWJOIN:
        main_skewjoin()
    elif CMS:
        main_cms()
    else:
        main()
