"""End-to-end training-data preparation pipeline.

The composed "documents in, training shards out" flow a training-data
run needs (the reference's analog is its per-file load pipeline,
/root/reference/proc/load_logs.py; this is the per-document version
built from the repo's own operators):

    read -> exact dedup (distributed semi-join against the keep-id
    set) -> quality filter -> language filter -> token count ->
    deterministic hash split -> [optional] partitioned parquet write
    + per-split counters

Every stage is one of the repo's gated operators; the composition adds
no new semantics, only plumbing:

* dedup keep-set semi-join, adaptive: when the keep-id set fits in
  memory (<= broadcast_limit ids at 8 B each) it is broadcast ONCE via
  ray.put and applied as a vectorized searchsorted filter — no shuffle;
  beyond that it falls back to a hash-partitioned ``Dataset.join`` on
  doc_id (only (doc_id) pairs and surviving rows move — a broadcast of
  a 100 TB keep list would itself be terabytes). For the join path,
  ``ops/bloom`` (build_bloom + prefilter) can cut the probe side's
  shuffle volume first — false positives only, result unchanged.
* counters: per-batch partial (split, n_docs, n_tokens) rows, tiny
  driver fold — the flagship's partial-combine pattern.
* write: hive-partitioned by split (``split=train/...``) so a failed
  run resumes per partition; deterministic content via the
  deterministic split.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data

from ..ops import dedup, split as split_ops, textstats

QUALITY_MIN = 0.3

# broadcast/shuffle crossover for the dedup keep-id semi-join. The
# PINNED broadcast is ids only (8 B each: 50M ids = 400 MB shared
# read-only via the object store), but the driver finish transiently
# pulls the (hash, id) partials at 16 B/row plus pandas/lexsort
# temporaries — budget ~4x the pinned size (~2-3 GB peak at this
# limit) on the driver. Lower the limit for small drivers. The
# hash-join fallback exists for the 10^9+-id keep sets a 100 TB
# corpus produces (a broadcast there would be tens of GB per node).
BROADCAST_IDS_LIMIT = 50_000_000

# ``Dataset.join`` wedges on 2-3-CPU clusters: the hash-shuffle
# aggregator actors (0.125 CPU each) plus one in-flight 1-CPU map task
# leave < 1 whole CPU for every other operator in the plan, and the
# streaming executor never frees it — reproduced (ray 2.49) with a
# 3.2M x 3M inner join at num_cpus=2 hanging >7 min that num_cpus=4
# finishes in 10.6 s. Below this many CPUs the semi-join broadcasts
# regardless of size (loudly) instead of joining.
MIN_JOIN_CPUS = 4


def semi_join_path(keep_count: int, broadcast_limit: int, cpus: int) -> str:
    """Decide the keep-set semi-join strategy: ``broadcast`` (ray.put
    once + searchsorted filter) or ``join`` (hash-partitioned
    ``Dataset.join``). Factored out so the tiny-cluster guard is unit-
    testable without spinning 2-CPU Ray sessions."""
    if keep_count <= broadcast_limit:
        return "broadcast"
    if cpus < MIN_JOIN_CPUS:
        import logging

        logging.getLogger(__name__).warning(
            "keep set (%d ids) exceeds broadcast_limit=%d but the "
            "cluster has only %d CPUs — Dataset.join deadlocks below "
            "%d CPUs (see prepare.MIN_JOIN_CPUS); broadcasting anyway "
            "(%.0f MB pinned per node; driver peak ~%.0f MB during "
            "the partials pull + lexsort)",
            keep_count, broadcast_limit, cpus, MIN_JOIN_CPUS,
            keep_count * 8 / 1e6, keep_count * 8 * 4 / 1e6,
        )
        return "broadcast"
    return "join"


def prepare_training_data(
    docs: "ray.data.Dataset",
    out_dir: str | None = None,
    quality_min: float = QUALITY_MIN,
    fractions: dict[str, float] | None = None,
    num_partitions: int | None = None,
    lang_filter: bool = True,
    broadcast_limit: int = BROADCAST_IDS_LIMIT,
    near_dup: bool = False,
    near_dup_threshold: float = 0.8,
) -> pd.DataFrame:
    """Run the full preparation flow; returns the per-split counters
    (split, n_docs, total_tokens). If ``out_dir`` is given, also writes
    the surviving rows as parquet partitioned by split."""
    fractions = fractions or {"train": 0.8, "val": 0.1, "test": 0.1}
    if num_partitions is None:
        from ..ops import default_join_partitions

        num_partitions = default_join_partitions()

    # materialize the per-block-reduced (hash, id) partials ONCE so
    # deciding broadcast-vs-join and the chosen path don't each re-run
    # the content-hash scan. The partial count upper-bounds the keep
    # count (per-block min-per-hash already applied), so it is the
    # conservative broadcast/join decision input.
    partials = dedup.exact_dedup_hash_partials(docs).materialize()
    cpus = int(ray.cluster_resources().get("CPU", 8))
    if semi_join_path(partials.count(), broadcast_limit, cpus) == "broadcast":
        # keep-set fits in memory as a sorted id array: finish the
        # min-per-hash on the DRIVER in the same single pull that the
        # broadcast needs anyway (one lexsort; skips the Dataset-form
        # finish's repartition(1) barrier + second pull), ray.put once,
        # vectorized searchsorted membership per batch — no shuffle,
        # and a plain-function stage fuses with the read + enrich
        # (ray.get of the shared array is a zero-copy local fetch)
        ids_ref = ray.put(
            dedup.keep_ids_array_from_partials(partials.to_pandas())
        )

        def keep_filter(b: pd.DataFrame) -> pd.DataFrame:
            ids = ray.get(ids_ref)
            v = b["doc_id"].to_numpy(dtype=np.int64)
            pos = np.searchsorted(ids, v)
            ok = (pos < len(ids)) & (ids[np.minimum(pos, len(ids) - 1)] == v)
            return b[ok]

        surviving = docs.map_batches(keep_filter, batch_format="pandas")
    else:
        # distributed finish over the shared partials (range sort ->
        # min per hash run), then the hash join
        keep = dedup.keep_ids_ds_from_partials(
            # 2x the join width for the range sort: the (hash, id)
            # projection otherwise inherits the read's block count,
            # capping sort parallelism (see keep_ids_ds_from_partials)
            partials, num_partitions=2 * num_partitions
        )
        surviving = docs.join(
            # keep descends from sorted_group_first's sort/union, which
            # can emit schema-less EMPTY blocks that poison the join
            # aggregator (ops/cluster.py keep_best); repartition
            # rebuilds the block list — the keep table is ids only
            keep.repartition(num_partitions),
            "inner", num_partitions=num_partitions,
            on=("doc_id",), right_on=("doc_id",),
        )

    if near_dup:
        # near-duplicate CLUSTER removal on top of exact dedup: LSH
        # candidates -> exact n-gram Jaccard verify -> connected
        # components -> drop non-canonical members (ops/cluster's
        # adaptive broadcast anti-filter / left_anti join)
        from ..ops import cluster as cluster_ops

        cand = dedup.minhash_lsh_candidates(docs, max_bucket=4096)
        pairs = dedup.ngram_jaccard_verify_ds(
            cand, docs, threshold=near_dup_threshold
        )
        surviving = cluster_ops.keep_canonical(
            surviving, pairs, broadcast_limit=broadcast_limit,
            num_partitions=num_partitions,
        )

    def enrich(b: pd.DataFrame) -> pd.DataFrame:
        # fused kernel: one text->arrow conversion + one [a-z]+
        # explode for both quality and langid (identical output to
        # the chained calls — pinned by test_ops_text_multimodal)
        q = textstats.quality_langid_batch(b)
        keep = q["quality_score"] >= quality_min
        if lang_filter:  # corpora without the stopword languages: disable
            keep &= q["lang_pred"] != "und"
        return textstats.token_count_batch(q[keep])

    enriched = split_ops.hash_split(
        surviving.map_batches(enrich, batch_format="pandas"),
        "doc_id",
        fractions,
        bucket_fn=split_ops.knuth_bucket,
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("split", as_index=False).agg(
            n_docs=("doc_id", "size"), total_tokens=("n_tokens", "sum")
        )
        return g

    if out_dir is not None:
        # single-pass write + counters: ONE consumption of the lazy
        # graph writes out_dir/split=<k>/part-*.parquet AND streams the
        # per-batch (split, n_docs, total_tokens) partials to the
        # driver (the flagship pattern, stages/route.py
        # write_routed_with_counts) — at 100 TB running the write and
        # the counter pass as two consumptions would double the
        # read->dedup-join->filter cost.
        import hashlib
        import os
        import shutil

        if os.path.isdir(out_dir):
            shutil.rmtree(out_dir)  # overwrite semantics, like write_parquet
        os.makedirs(out_dir, exist_ok=True)

        def write_and_count(b: pd.DataFrame) -> pd.DataFrame:
            # content-derived filename over the batch's full doc_id
            # column: retried tasks re-derive the same name and
            # overwrite their own file (idempotent under Ray Data's
            # deterministic block lineage, never append-duplicate)
            for s, sub in b.groupby("split"):
                part = hashlib.sha1(
                    sub["doc_id"].to_numpy(dtype=np.int64).tobytes()
                ).hexdigest()[:16]
                d = os.path.join(out_dir, f"split={s}")
                os.makedirs(d, exist_ok=True)
                sub.drop(columns=["split"]).to_parquet(
                    os.path.join(d, f"part-{part}.parquet"), index=False
                )
            return partial(b)

        out = enriched.map_batches(
            write_and_count, batch_format="pandas"
        ).to_pandas()
    else:
        out = enriched.map_batches(partial, batch_format="pandas").to_pandas()
    if len(out) == 0:  # every row filtered: to_pandas drops the schema
        return pd.DataFrame(
            {"split": pd.Series([], dtype=object),
             "n_docs": pd.Series([], dtype="int64"),
             "total_tokens": pd.Series([], dtype="int64")}
        )
    out = out.groupby("split", as_index=False).agg(
        n_docs=("n_docs", "sum"), total_tokens=("total_tokens", "sum")
    )
    out["n_docs"] = out["n_docs"].astype("int64")
    out["total_tokens"] = out["total_tokens"].astype("int64")
    return out
