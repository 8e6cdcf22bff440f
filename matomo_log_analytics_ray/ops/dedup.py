"""Deduplication operators over a (id, text) document table.

Five families, each shaped for 100 TB operation:

* exact          content-hash partition + per-group min-id (one shuffle
                 over (hash, id) pairs only — text never moves)
* minhash_lsh    shingle -> 64-perm minhash -> banded LSH buckets ->
                 candidate pairs -> signature-estimated Jaccard verify
* simhash        64-bit sign-sum fingerprint; near-dup = bucketed by
                 16-bit chunks (Hamming<=3 guarantees a matching chunk)
* ngram_jaccard  exact Jaccard verification of candidate pairs (the
                 precise re-check stage after any LSH family)
* embedding near-dup lives in ops/similarity.py (cosine >= threshold)

Everything before the groupby is a vectorized map_batches kernel
(numpy/pandas; no per-row Python in the hot path); the shuffles move
only (key, id) or (band, hash, id) projections, never document text.
The reference has no dedup beyond insert-if-absent on file paths
(/root/reference/libs/lib_database.py:73-94, SURVEY.md D1); these
operators generalize that to content identity for training-data scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data
from ray.data.aggregate import Count

from . import hashing

MINHASH_PERMS = 64
LSH_BANDS = 16  # 16 bands x 4 rows
SIMHASH_CHUNKS = 4  # 4 x 16-bit chunks -> catches Hamming distance <= 3

_rng = np.random.default_rng(0xC0FFEE)
_MINHASH_A = _rng.integers(1, 2**63 - 1, size=MINHASH_PERMS, dtype=np.uint64) | np.uint64(1)
_MINHASH_B = _rng.integers(0, 2**63 - 1, size=MINHASH_PERMS, dtype=np.uint64)
_BAND_MIX = _rng.integers(1, 2**63 - 1, size=MINHASH_PERMS // LSH_BANDS, dtype=np.uint64) | np.uint64(1)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def _content_hash_batch(id_col: str, text_col: str, normalize=None):
    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        text = batch[text_col]
        if normalize is not None:
            text = normalize(text)
        return pd.DataFrame(
            {
                "content_hash": hashing.mix(hashing.hash_strings(text)),
                id_col: batch[id_col].to_numpy(),
            }
        )

    return fn


def prefix_key(n_words: int):
    """Normalizer factory: the document's first ``n_words`` whitespace
    tokens joined by single spaces (docs with fewer words keep what
    they have) — SQL twin: array_to_string(list_slice(string_split(
    text, ' '), 1, n), ' ')."""

    def norm(text: pd.Series) -> pd.Series:
        return text.fillna("").str.split(" ").str[:n_words].str.join(" ")

    return norm


def first_token_key(text: pd.Series) -> pd.Series:
    """Normalizer for key-based exact dedup: the document's first
    whitespace token (a cheap stand-in for a canonicalized content key
    when full texts are unique — e.g. URL-less boilerplate grouping)."""
    return text.str.split(" ", n=1).str[0]


def _min_id_per_hash(h: np.ndarray, i: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """min id per hash via ONE lexsort + run mask (no per-group Python;
    groupby.first measured 2.75 s vs 1.0 s at 3.2M ~unique hashes).
    Returns (kept hashes, kept ids) in hash order; id dtype preserved
    (callers cast where a fixed dtype matters)."""
    order = np.lexsort((i, h))
    hs = h[order]
    keep = np.ones(len(hs), dtype=bool)
    keep[1:] = hs[1:] != hs[:-1]
    return hs[keep], i[order][keep]


def exact_dedup_hash_partials(
    docs: "ray.data.Dataset", id_col: str = "doc_id", text_col: str = "text"
) -> "ray.data.Dataset":
    """Per-block-reduced (content_hash, id) partials: hash every text,
    then keep min id per hash WITHIN the block before anything shuffles
    (combiner — global min-per-hash == min over per-block mins, so any
    downstream finish is exact). On dup-heavy corpora this shrinks the
    combine/sort input toward the distinct-text count; on all-unique
    input it costs one parallel per-block lexsort."""
    hash_fn = _content_hash_batch(id_col, text_col)

    def hash_and_block_reduce(batch: pd.DataFrame) -> pd.DataFrame:
        b = hash_fn(batch)
        hs, ik = _min_id_per_hash(
            b["content_hash"].to_numpy(), b[id_col].to_numpy()
        )
        return pd.DataFrame({"content_hash": hs, id_col: ik})

    return docs.map_batches(hash_and_block_reduce, batch_format="pandas")


def keep_ids_array_from_partials(
    partials_df: pd.DataFrame, id_col: str = "doc_id"
) -> np.ndarray:
    """Driver finish for the BROADCAST path: one lexsort + run mask
    over the pulled partials, ids returned SORTED (the layout the
    searchsorted membership filter wants). Skips the repartition(1)
    barrier and the second driver pull the Dataset-form finish pays —
    only valid when the partials fit on the driver (the caller's
    broadcast-limit decision)."""
    if len(partials_df) == 0:
        return np.empty(0, dtype=np.int64)
    _, ik = _min_id_per_hash(
        partials_df["content_hash"].to_numpy(),
        partials_df[id_col].to_numpy(dtype=np.int64),
    )
    return np.sort(ik)


def exact_dedup_keep_ids(
    docs: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    combine_limit: int = 5_000_000,
) -> "ray.data.Dataset":
    """One kept id per distinct text: range-partition on (content hash,
    id), keep the first id of each hash run. Only (hash, id) pairs
    shuffle; min-per-group via sorted runs instead of Ray's aggregate
    (per-group Python cost dominates at ~distinct-text cardinality)."""
    from . import default_join_partitions, drop_empty_blocks

    rows = exact_dedup_hash_partials(docs, id_col, text_col).materialize()
    # Adaptive combine (the q3/qsketch pattern): the (hash, id)
    # projection is 16 B/row, so <= 5M rows is <= 80 MB — one lexsort
    # task beats the range-sort exchange's ~2s fixed cost. The hashing
    # scan above stays fully distributed either way.
    if rows.count() <= combine_limit:
        def combine(b: pd.DataFrame) -> pd.DataFrame:
            # this task is the plan's one serial step
            _, ik = _min_id_per_hash(
                b["content_hash"].to_numpy(), b[id_col].to_numpy()
            )
            return pd.DataFrame({id_col: ik})

        return drop_empty_blocks(rows).repartition(1).map_batches(
            combine, batch_format="pandas"
        )
    return keep_ids_ds_from_partials(rows, id_col)


def keep_ids_ds_from_partials(
    partials: "ray.data.Dataset",
    id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Distributed finish over (content_hash, id) partials: range sort
    + min per hash run. The (hash, id) projection inherits the READ's
    block count, and a single large parquet file reads as ~4 x 128MB
    blocks — which caps the sort at 4 partitions no matter the cluster
    size (measured 18.6 s -> 5.2 s at 8 CPUs on 1.6M docs).
    Repartition the 16-byte-per-row projection up to the cluster width
    first; the pass is trivial next to the sort it unblocks."""
    from . import default_join_partitions

    if num_partitions is None:
        num_partitions = 2 * default_join_partitions()
    rows = partials.repartition(max(2, num_partitions))
    return sorted_group_first(rows, ["content_hash"], id_col).select_columns([id_col])


def exact_dup_groups(
    docs: "ray.data.Dataset", id_col: str = "doc_id", text_col: str = "text", normalize=None
) -> "ray.data.Dataset":
    """(content_hash, n_dups) for groups with more than one member.

    `normalize` optionally canonicalizes text before hashing (e.g.
    `first_token_key`) so near-boilerplate groups collapse."""
    counts = (
        docs.map_batches(_content_hash_batch(id_col, text_col, normalize), batch_format="pandas")
        .groupby("content_hash")
        .aggregate(Count(alias_name="n_dups"))
    )

    def only_dups(b: pd.DataFrame) -> pd.DataFrame:
        return b[b["n_dups"] > 1]

    return counts.map_batches(only_dups, batch_format="pandas")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signature_batch(
    batch: pd.DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3
) -> pd.DataFrame:
    """One row per doc: id + the 64 minhash values as a fixed-size list.

    Vectorized: per permutation j, sig_j(doc) = min over the doc's
    shingles of (a_j * shingle + b_j) — computed with one
    minimum.reduceat over the flat shingle array per permutation.
    """
    wh, off = hashing.tokenize_words(batch[text_col])
    sh, soff = hashing.shingle_hashes(wh, off, k=k)
    n_docs = len(batch)
    sig = np.full((n_docs, MINHASH_PERMS), np.iinfo(np.uint64).max, dtype=np.uint64)
    nonempty = np.diff(soff) > 0
    starts = soff[:-1][nonempty]
    if len(sh):
        for j in range(MINHASH_PERMS):
            hj = _MINHASH_A[j] * sh + _MINHASH_B[j]
            sig[nonempty, j] = np.minimum.reduceat(hj, starts)
    return pd.DataFrame({id_col: batch[id_col].to_numpy(), "signature": list(sig)})


def _band_rows(id_col: str):
    rows_per_band = MINHASH_PERMS // LSH_BANDS

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        sig = np.stack(batch["signature"].to_numpy())  # (docs, 64)
        ids = batch[id_col].to_numpy()
        n = len(ids)
        bands = sig.reshape(n, LSH_BANDS, rows_per_band).astype(np.uint64)
        bh = np.zeros((n, LSH_BANDS), dtype=np.uint64)
        for i in range(rows_per_band):
            bh = hashing.mix(bh + _BAND_MIX[i] * bands[:, :, i])
        return pd.DataFrame(
            {
                "band": np.tile(np.arange(LSH_BANDS, dtype=np.int32), n),
                "band_hash": bh.reshape(-1),
                id_col: np.repeat(ids, LSH_BANDS),
            }
        )

    return fn


def _pairs_from_bucket(id_col: str, max_bucket: int = 64):
    def fn(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(g[id_col].to_numpy())
        if len(ids) < 2:
            empty = ids[:0]
            return pd.DataFrame({"id_a": empty, "id_b": empty})
        ids = ids[:max_bucket]  # cap pathological buckets; logged via metrics
        a, b = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"id_a": ids[a], "id_b": ids[b]})

    return fn


def _ids_to_pairs(ids: np.ndarray, max_bucket: int) -> tuple[np.ndarray, np.ndarray]:
    if len(ids) > max_bucket:
        # loud, bounded (once per run per worker task): the repo
        # convention is documented caps, never silent ones
        import logging

        logging.getLogger(__name__).warning(
            "bucket_pairs: bucket with %d ids truncated to max_bucket=%d "
            "(keeping the smallest ids)", len(ids), max_bucket
        )
        ids = ids[:max_bucket]
    a, b = np.triu_indices(len(ids), k=1)
    return ids[a], ids[b]


def bucket_pairs(
    rows: "ray.data.Dataset",
    bucket_cols: list[str],
    id_col: str,
    max_bucket: int = 64,
) -> "ray.data.Dataset":
    """All (id_a < id_b) pairs sharing a bucket — WITHOUT map_groups.

    ``groupby().map_groups`` pays ~1 ms of Ray overhead per group;
    LSH bucketing makes O(n_docs) near-singleton groups, so that path
    measured 7.5 min for 100k docs. Here the rows are range-sorted by
    (bucket, id) once, then each sorted block emits pairs for its
    INTERIOR runs with plain numpy; the first/last run of every block
    may straddle a boundary, so those rows are passed through as edge
    rows and paired in one final single-block pass. Edge rows are
    PRE-REDUCED per block — each edge run forwards at most
    ``max_bucket`` distinct ids — so the merge task sees
    O(blocks x max_bucket) rows even when one hot bucket spans entire
    blocks (ids are globally sorted, so the union of per-block
    prefixes always contains the bucket's smallest ``max_bucket`` ids,
    the same set a global truncation would keep). Results are
    identical and deterministic regardless of block boundaries: every
    bucket is either fully interior to one block or fully covered by
    the edge pass.
    """
    sorted_ds = rows.sort(bucket_cols + [id_col])

    def block_fn(b: pd.DataFrame) -> pd.DataFrame:
        n = len(b)
        if n == 0:
            # empty ids MUST keep the id dtype (an object/null-typed
            # empty column degrades downstream sort blocks to
            # schema-less empties, breaking hash joins)
            empty_id = b[id_col].iloc[:0]
            return pd.DataFrame(
                {"kind": pd.Series([], dtype=object), "id_a": empty_id,
                 "id_b": empty_id,
                 **{c: pd.Series([], dtype=b[c].dtype) for c in bucket_cols}}
            )
        change = np.zeros(n, dtype=bool)
        change[0] = True
        for c in bucket_cols:
            v = b[c].to_numpy()
            change[1:] |= v[1:] != v[:-1]
        run_id = np.cumsum(change) - 1
        last = run_id[-1]
        ids = b[id_col].to_numpy()
        out_a, out_b = [], []
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], n)
        for r in range(1, last):  # interior runs only
            s, e = starts[r], ends[r]
            if e - s >= 2:
                a, bb = _ids_to_pairs(ids[s:e], max_bucket)
                out_a.append(a)
                out_b.append(bb)
        pa_ids = np.concatenate(out_a) if out_a else np.array([], dtype=ids.dtype)
        pb_ids = np.concatenate(out_b) if out_b else np.array([], dtype=ids.dtype)
        pairs = pd.DataFrame({"kind": "pair", "id_a": pa_ids, "id_b": pb_ids})
        for c in bucket_cols:
            pairs[c] = b[c].iloc[0]  # placeholder; unused for pairs
        # edge pre-reduction: each edge run forwards at most max_bucket
        # distinct ids (its smallest — the run is id-sorted), bounding
        # the merge task's input at 2 x max_bucket rows per block
        edge_frames = []
        for r in ([0] if last == 0 else [0, last]):
            s, e = starts[r], ends[r]
            run_ids = np.unique(ids[s:e])[:max_bucket]
            ef = pd.DataFrame({"id_a": run_ids, "id_b": run_ids})
            ef["kind"] = "edge"
            for c in bucket_cols:
                ef[c] = b[c].iloc[s]
            edge_frames.append(ef)
        edges = pd.concat(edge_frames, ignore_index=True)
        return pd.concat([pairs, edges[pairs.columns]], ignore_index=True)

    # materialize so the pair and edge branches don't re-run the sort
    tagged = sorted_ds.map_batches(block_fn, batch_format="pandas").materialize()

    pairs = tagged.map_batches(
        lambda b: b[b["kind"] == "pair"][["id_a", "id_b"]], batch_format="pandas"
    )

    def edge_pairs(b: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _, g in b.groupby(bucket_cols, sort=False):
            ids = np.unique(g["id_a"].to_numpy())
            if len(ids) >= 2:
                a, bb = _ids_to_pairs(ids, max_bucket)
                out_a.append(a)
                out_b.append(bb)
        if not out_a:
            # empty frames must keep the id dtype: an untyped empty
            # (float64) block makes downstream sort/union emit
            # schema-less blocks that break hash joins
            empty = b["id_a"].iloc[:0]
            return pd.DataFrame({"id_a": empty, "id_b": empty})
        return pd.DataFrame(
            {"id_a": np.concatenate(out_a), "id_b": np.concatenate(out_b)}
        )

    # ONLY the edge rows (a few runs per block) coalesce to one task;
    # the bulk pair stream never funnels through a single partition
    edges = (
        tagged.map_batches(
            lambda b: b[b["kind"] == "edge"][["id_a", *bucket_cols]],
            batch_format="pandas",
        )
        .repartition(1)
        .map_batches(edge_pairs, batch_format="pandas")
    )
    return pairs.union(edges)


def sorted_group_counts(
    rows: "ray.data.Dataset", key_cols: list[str], alias: str = "n"
) -> "ray.data.Dataset":
    """groupby(key_cols).count() for HIGH-CARDINALITY keys, via sort +
    vectorized run counting instead of Ray's aggregate.

    Ray's sort-based groupby aggregate pays per-group Python cost —
    measured 454 s for ~3.5M distinct pair keys, where this path takes
    seconds. Same interior/edge discipline as bucket_pairs: interior
    runs of each sorted block collapse to (key, run_length) with numpy;
    the first/last run of every block may straddle a boundary and is
    forwarded as a PRE-REDUCED (key, partial_count) row — at most two
    rows per block, so the final merge pass sees O(blocks) rows even
    when one hot key spans entire blocks."""
    sorted_ds = rows.sort(key_cols)

    def block_fn(b: pd.DataFrame) -> pd.DataFrame:
        n = len(b)
        if n == 0:
            out = {c: pd.Series([], dtype=b[c].dtype) for c in key_cols}
            out[alias] = pd.Series([], dtype="int64")
            out["kind"] = pd.Series([], dtype=object)
            return pd.DataFrame(out)
        change = np.zeros(n, dtype=bool)
        change[0] = True
        for c in key_cols:
            v = b[c].to_numpy()
            change[1:] |= v[1:] != v[:-1]
        run_id = np.cumsum(change) - 1
        last = run_id[-1]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], n)
        interior = (np.arange(last + 1) != 0) & (np.arange(last + 1) != last)
        rows_out = b.iloc[starts[interior]][key_cols].copy()
        rows_out[alias] = (ends - starts)[interior].astype("int64")
        rows_out["kind"] = "done"
        # edge pre-reduction: one (key, partial_count) row per edge run
        edge_runs = [0] if last == 0 else [0, last]
        edges = b.iloc[[starts[r] for r in edge_runs]][key_cols].copy()
        edges[alias] = np.asarray(
            [ends[r] - starts[r] for r in edge_runs], dtype="int64"
        )
        edges["kind"] = "edge"
        return pd.concat([rows_out, edges], ignore_index=True)

    from . import drop_empty_blocks

    # sort can emit empty range partitions; block_fn's typed-empty
    # outputs would make the done/edge filter maps emit schema-less
    # blocks (Ray skips the UDF on empty blocks) — rebuild the block
    # list, free on an already-materialized dataset
    tagged = drop_empty_blocks(
        sorted_ds.map_batches(block_fn, batch_format="pandas").materialize()
    )
    done = tagged.map_batches(
        lambda b: b[b["kind"] == "done"][[*key_cols, alias]], batch_format="pandas"
    )

    def edge_counts(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            out = {c: pd.Series([], dtype=b[c].dtype) for c in key_cols}
            out[alias] = pd.Series([], dtype="int64")
            return pd.DataFrame(out)
        g = b.groupby(key_cols, as_index=False, sort=False)[alias].sum()
        g[alias] = g[alias].astype("int64")
        return g

    edges = (
        tagged.map_batches(
            lambda b: b[b["kind"] == "edge"][[*key_cols, alias]],
            batch_format="pandas",
        )
        .repartition(1)
        .map_batches(edge_counts, batch_format="pandas")
    )
    return done.union(edges)


def sorted_group_first(
    rows: "ray.data.Dataset", key_cols: list[str], val_col: "str | list[str]"
) -> "ray.data.Dataset":
    """min(val) per key for HIGH-CARDINALITY keys: sort by (key, val)
    then take the first row of each run (same interior/edge discipline
    as sorted_group_counts). ``val_col`` may be a list: the kept row
    is the LEXICOGRAPHIC minimum over the value columns (e.g.
    (-priority, id) keeps the highest-priority member, ties by id)."""
    val_cols = [val_col] if isinstance(val_col, str) else list(val_col)
    sorted_ds = rows.sort(key_cols + val_cols)

    def block_fn(b: pd.DataFrame) -> pd.DataFrame:
        n = len(b)
        if n == 0:
            out = b[[*key_cols, *val_cols]].copy()
            out["kind"] = pd.Series([], dtype=object)
            return out
        change = np.zeros(n, dtype=bool)
        change[0] = True
        for c in key_cols:
            v = b[c].to_numpy()
            change[1:] |= v[1:] != v[:-1]
        run_id = np.cumsum(change) - 1
        last = run_id[-1]
        starts = np.flatnonzero(change)
        interior = (np.arange(last + 1) != 0) & (np.arange(last + 1) != last)
        firsts = b.iloc[starts[interior]][[*key_cols, *val_cols]].copy()
        firsts["kind"] = "done"
        # edge pre-reduction: the block is sorted by (key, val), so the
        # first row of each edge run already carries that key's min val
        # within this block — forward just those (<= 2 rows per block)
        edge_runs = [0] if last == 0 else [0, last]
        edges = b.iloc[[starts[r] for r in edge_runs]][[*key_cols, *val_cols]].copy()
        edges["kind"] = "edge"
        return pd.concat([firsts, edges], ignore_index=True)

    tagged = sorted_ds.map_batches(block_fn, batch_format="pandas").materialize()
    done = tagged.map_batches(
        lambda b: b[b["kind"] == "done"][[*key_cols, *val_cols]], batch_format="pandas"
    )

    def edge_first(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return b[[*key_cols, *val_cols]].copy()
        return (
            b.sort_values([*key_cols, *val_cols])
            .groupby(key_cols, as_index=False, sort=False)
            .first()[[*key_cols, *val_cols]]
        )

    edges = (
        tagged.map_batches(
            lambda b: b[b["kind"] == "edge"][[*key_cols, *val_cols]],
            batch_format="pandas",
        )
        .repartition(1)
        .map_batches(edge_first, batch_format="pandas")
    )
    return done.union(edges)


def minhash_lsh_candidates(
    docs: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    max_bucket: int = 64,
) -> "ray.data.Dataset":
    """Candidate near-dup pairs (id_a < id_b), deduplicated across
    bands. ``max_bucket`` is the skew-safety valve: a bucket with more
    members contributes pairs among its smallest ``max_bucket`` ids
    only (all-pairs in a degenerate bucket is quadratic); candidate
    completeness is exact iff every bucket fits. Verification gates
    pass a cap sized above their corpus's largest plausible bucket."""
    sigs = docs.map_batches(
        lambda b: minhash_signature_batch(b, id_col, text_col, k),
        batch_format="pandas",
    )
    rows = sigs.map_batches(_band_rows(id_col), batch_format="pandas")
    pairs = bucket_pairs(
        rows, ["band", "band_hash"], id_col, max_bucket=max_bucket
    ).materialize()
    # a pair can surface from several bands -> distinct with a band
    # count. Adaptive (the prepare/verify discipline): a small
    # candidate set collapses in ONE task — the sorted-run machinery's
    # range-sort fixed cost (~1 s on 32 CPUs) dwarfs a single lexsort
    # over a few thousand pairs; past the limit the sort path keeps
    # every reduce task bounded.
    if pairs.count() <= 5_000_000:

        def distinct_counts(b: pd.DataFrame) -> pd.DataFrame:
            if len(b) == 0:
                return pd.DataFrame(
                    {
                        "id_a": b["id_a"],
                        "id_b": b["id_b"],
                        "n_bands": pd.Series([], dtype="int64"),
                    }
                )
            a = b["id_a"].to_numpy()
            c = b["id_b"].to_numpy()
            order = np.lexsort((c, a))
            a, c = a[order], c[order]
            first = np.ones(len(a), dtype=bool)
            first[1:] = (a[1:] != a[:-1]) | (c[1:] != c[:-1])
            starts = np.flatnonzero(first)
            counts = np.diff(np.append(starts, len(a)))
            return pd.DataFrame(
                {
                    "id_a": a[starts],
                    "id_b": c[starts],
                    "n_bands": counts.astype("int64"),
                }
            )

        return pairs.repartition(1).map_batches(
            distinct_counts, batch_format="pandas"
        )
    return sorted_group_counts(pairs, ["id_a", "id_b"], alias="n_bands")


def estimate_jaccard_pairs(
    pairs_df: pd.DataFrame, signatures_df: pd.DataFrame, id_col: str = "doc_id"
) -> pd.DataFrame:
    """Signature-estimated Jaccard per candidate pair (driver-side; the
    candidate set is small relative to the corpus by construction)."""
    sig_by_id = dict(
        zip(signatures_df[id_col].to_numpy(), signatures_df["signature"].to_numpy())
    )
    est = [
        float(np.mean(np.asarray(sig_by_id[a]) == np.asarray(sig_by_id[b])))
        for a, b in zip(pairs_df["id_a"], pairs_df["id_b"])
    ]
    out = pairs_df.copy()
    out["est_jaccard"] = est
    return out


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_batch(
    batch: pd.DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> pd.DataFrame:
    """64-bit simhash per doc: sign of the per-bit sum of word hashes."""
    wh, off = hashing.tokenize_words(batch[text_col])
    n_docs = len(batch)
    fp = np.zeros(n_docs, dtype=np.uint64)
    if len(wh):
        bits = ((wh[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(
            np.int64
        ) * 2 - 1  # (words, 64) in {-1, +1}
        starts = off[:-1].copy()
        # reduceat needs strictly valid starts; empty docs handled after
        nonempty = np.diff(off) > 0
        sums = np.zeros((n_docs, 64), dtype=np.int64)
        if nonempty.any():
            red = np.add.reduceat(bits, off[:-1][nonempty])
            sums[nonempty] = red
        pos = (sums > 0).astype(np.uint64)
        fp = (pos << np.arange(64, dtype=np.uint64)).sum(axis=1, dtype=np.uint64)
    return pd.DataFrame({id_col: batch[id_col].to_numpy(), "simhash": fp})


def simhash_candidates(
    docs: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket: int = 64,
    fps: "ray.data.Dataset | None" = None,
) -> "ray.data.Dataset":
    """Candidate pairs bucketed by 16-bit fingerprint chunks (any pair
    within Hamming distance 3 shares at least one of the 4 chunks).
    Pass precomputed ``fps`` (simhash_fingerprints) to avoid
    re-hashing the corpus when a verify stage also needs them.
    ``max_bucket`` caps degenerate chunk buckets (see
    minhash_lsh_candidates) — completeness of the Hamming<=3 guarantee
    holds iff every chunk bucket fits."""
    if fps is None:
        fps = simhash_fingerprints(docs, id_col, text_col)

    def chunk_rows(b: pd.DataFrame) -> pd.DataFrame:
        fp = b["simhash"].to_numpy(dtype=np.uint64)
        ids = b[id_col].to_numpy()
        n = len(ids)
        chunks = np.stack(
            [(fp >> np.uint64(16 * c)) & np.uint64(0xFFFF) for c in range(SIMHASH_CHUNKS)],
            axis=1,
        )
        return pd.DataFrame(
            {
                "chunk": np.tile(np.arange(SIMHASH_CHUNKS, dtype=np.int32), n),
                "chunk_val": chunks.reshape(-1),
                id_col: np.repeat(ids, SIMHASH_CHUNKS),
            }
        )

    rows = fps.map_batches(chunk_rows, batch_format="pandas")
    pairs = bucket_pairs(rows, ["chunk", "chunk_val"], id_col, max_bucket=max_bucket)
    return sorted_group_counts(pairs, ["id_a", "id_b"], alias="n_chunks")


def simhash_fingerprints(
    docs: "ray.data.Dataset", id_col: str = "doc_id", text_col: str = "text"
) -> "ray.data.Dataset":
    """(id, simhash) per document — the shared input of
    simhash_candidates and simhash_hamming_verify_ds (materialize it
    when running both, so the corpus is tokenized+hashed ONCE)."""
    return docs.map_batches(
        lambda b: simhash_batch(b, id_col, text_col), batch_format="pandas"
    )


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (numpy<2 has no bitwise_count)."""
    x = np.ascontiguousarray(x, dtype=np.uint64)
    if len(x) == 0:
        return np.zeros(0, dtype=np.int64)
    return (
        np.unpackbits(x.view(np.uint8)).reshape(len(x), 64).sum(axis=1).astype(np.int64)
    )


def hamming_distance(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return popcount64(np.bitwise_xor(a.astype(np.uint64), b.astype(np.uint64)))


def arrow_col_type(ds: "ray.data.Dataset", col: str):
    """Arrow type of a dataset column (from the known schema — no
    execution), for normalizing pair blocks ahead of a hash join."""
    import pyarrow as pa

    schema = ds.schema()
    base = getattr(schema, "base_schema", None)
    if isinstance(base, pa.Schema):
        return base.field(col).type
    if base is not None and hasattr(base, "names"):  # PandasBlockSchema
        i = list(base.names).index(col)
        return pa.from_numpy_dtype(base.types[i])
    # no silent int64 guess: a wrong join-key type makes hash joins
    # match nothing with no error — fail loudly instead
    raise TypeError(
        f"cannot determine Arrow type of column {col!r} from schema {schema!r}"
    )


def arrow_col_type_or(ds: "ray.data.Dataset", col: str, default):
    """arrow_col_type with a caller-supplied fallback for columns whose
    block schema carries no Arrow type (pandas object dtype)."""
    try:
        return arrow_col_type(ds, col)
    except Exception:
        return default


def normalize_pair_ids(
    pairs: "ray.data.Dataset", id_type, num_blocks: int = 8
) -> "ray.data.Dataset":
    """Cast every (id_a, id_b) block to one explicit Arrow schema and
    rebuild the block list. Sort/union stages can emit degenerate
    schema-less EMPTY blocks which map stages skip (so no UDF can fix
    them in place) and which poison Ray's hash-join aggregator when a
    join partition ends up empty; the repartition drops them. Pairs are
    small projections, so this extra exchange is cheap.

    The output is MATERIALIZED and, when there are zero candidate
    pairs anywhere, replaced by one explicitly-typed empty Arrow block
    — a fully-empty lazy dataset reaches pyarrow's join as schema-less
    and fails with "no match for key field" (single-doc corpora,
    tightened thresholds)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray.data as rd

    def fn(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "id_a": pc.cast(t["id_a"], id_type),
                "id_b": pc.cast(t["id_b"], id_type),
            }
        )

    return (
        pairs.select_columns(["id_a", "id_b"])
        .map_batches(fn, batch_format="pyarrow")
        .repartition(num_blocks)
        .materialize()
    )


def typed_empty_pairs(id_type, extra_cols: dict | None = None):
    """One explicitly-typed EMPTY (id_a, id_b, *extra) dataset — the
    zero-candidate short-circuit every pair-verification join needs:
    Ray's hash-join aggregator builds schema-less partitions when zero
    rows shuffle, so an empty lazy side fails pyarrow's join with "no
    match for key field" no matter how its blocks were typed.  Callers
    check ``pairs.count() == 0`` (free after normalize_pair_ids, which
    materializes) and return this instead of joining."""
    import pyarrow as pa

    import ray.data as rd

    cols = {
        "id_a": pa.array([], type=id_type),
        "id_b": pa.array([], type=id_type),
    }
    for name, t in (extra_cols or {}).items():
        cols[name] = pa.array([], type=t)
    return rd.from_arrow(pa.table(cols))


def _attach_side(
    docs: "ray.data.Dataset",
    id_col: str,
    payload_col: str,
    out_id: str,
    out_payload: str,
    payload_type=None,
):
    """Projection renaming (id, payload) -> (out_id, out_payload) for a
    pair-verification join side. Blocks are emitted as Arrow tables
    cast to ONE explicit schema: a pandas projection would turn an
    empty block's object column into a null-typed Arrow column, and
    mixed null/string chunk schemas can poison the hash-join
    aggregator's concat (the normalize_pair_ids failure class, on the
    payload side). ``payload_type`` overrides schema inference for
    pandas-block inputs whose object dtype carries no Arrow type."""
    import pyarrow as pa
    import pyarrow.compute as pc

    id_t = arrow_col_type(docs, id_col)
    if payload_type is None:
        payload_type = arrow_col_type(docs, payload_col)
    pay_t = payload_type

    def fn(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                out_id: pc.cast(t[id_col], id_t),
                out_payload: pc.cast(t[payload_col], pay_t),
            }
        )

    return docs.select_columns([id_col, payload_col]).map_batches(
        fn, batch_format="pyarrow"
    )


def simhash_hamming_verify_ds(
    pairs: "ray.data.Dataset",
    docs: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    num_partitions: int = 8,
    fps: "ray.data.Dataset | None" = None,
) -> "ray.data.Dataset":
    """Distributed Hamming verification of candidate pairs: the
    fingerprints are attached to each pair side with two
    hash-partitioned joins, then XOR+popcount keeps pairs within
    ``max_hamming``. Pass the ``fps`` you already computed for
    simhash_candidates (materialized) so the corpus is hashed once,
    not twice. Combined with simhash_candidates (4x16-bit chunk
    bucketing guarantees every Hamming<=3 pair shares a chunk), the
    output is exactly the set of pairs at Hamming <= 3 PROVIDED no
    chunk bucket exceeded the candidates' ``max_bucket`` cap — the
    chunk theorem covers the geometry; the cap is the one
    approximation knob (skew-safety valve)."""
    if fps is None:
        fps = simhash_fingerprints(docs, id_col, text_col)
    import pyarrow as pa

    fp_t = arrow_col_type_or(fps, "simhash", pa.uint64())
    fa = _attach_side(fps, id_col, "simhash", "id_a", "fp_a", payload_type=fp_t)
    fb = _attach_side(fps, id_col, "simhash", "id_b", "fp_b", payload_type=fp_t)
    id_t = arrow_col_type(docs, id_col)
    pairs = normalize_pair_ids(pairs, id_t, num_partitions)
    if pairs.count() == 0:
        return typed_empty_pairs(id_t, {"hamming": pa.int64()})
    j = pairs.join(fa, "inner", num_partitions=num_partitions, on=("id_a",))
    j = j.join(fb, "inner", num_partitions=num_partitions, on=("id_b",))

    def kernel(b: pd.DataFrame) -> pd.DataFrame:
        ham = hamming_distance(
            b["fp_a"].to_numpy(dtype=np.uint64), b["fp_b"].to_numpy(dtype=np.uint64)
        )
        keep = ham <= max_hamming
        return pd.DataFrame(
            {
                "id_a": b["id_a"].to_numpy()[keep],
                "id_b": b["id_b"].to_numpy()[keep],
                "hamming": ham[keep],
            }
        )

    return j.map_batches(kernel, batch_format="pandas")


def _shingle_id_sets(texts: pd.Series, k: int) -> list:
    wh, off = hashing.tokenize_words(texts)
    sh, soff = hashing.shingle_hashes(wh, off, k=k)
    return [np.unique(sh[soff[i] : soff[i + 1]]) for i in range(len(texts))]


def ngram_jaccard_verify_ds(
    pairs: "ray.data.Dataset",
    docs: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.8,
    num_partitions: int = 8,
    broadcast_pairs_limit: int = 50_000,
) -> "ray.data.Dataset":
    """Distributed exact k-gram Jaccard verification of candidate
    pairs — the precise re-check after minhash LSH, run as a pipeline
    stage instead of on the driver. Adaptive text attach (the
    pipelines/prepare discipline): at or under
    ``broadcast_pairs_limit`` candidate pairs, the needed texts (at
    most 2 x n_pairs docs, one membership-filter scan — no shuffle)
    are broadcast with ``ray.put`` and attached by searchsorted
    lookup inside the verify map, so the docs table never shuffles
    to verify a handful of candidates; past the limit, two
    hash-partitioned joins attach each side's text (only candidate
    pairs carry text through the shuffle). The kernel computes exact
    shingle-set Jaccard and keeps pairs >= threshold. Per-pair cost
    is O(|shingles|); candidate volume is bounded by the LSH band
    structure."""

    import pyarrow as pa

    import ray as _ray

    text_t = arrow_col_type_or(docs, text_col, pa.string())
    id_t = arrow_col_type(docs, id_col)
    pairs = normalize_pair_ids(pairs, id_t, num_partitions)
    n_pairs = pairs.count()
    if n_pairs == 0:
        return typed_empty_pairs(id_t, {"jaccard": pa.float64()})
    if n_pairs <= broadcast_pairs_limit:
        pdf = pairs.to_pandas()
        need = np.unique(
            np.concatenate([pdf["id_a"].to_numpy(), pdf["id_b"].to_numpy()])
        )
        need_ref = _ray.put(need)

        def pick(t: pa.Table) -> pa.Table:
            a = _ray.get(need_ref)
            ids = t.column(id_col).to_numpy(zero_copy_only=False)
            if len(a) == 0 or len(ids) == 0:
                return t.slice(0, 0)
            pos = np.minimum(np.searchsorted(a, ids), len(a) - 1)
            return t.filter(pa.array(a[pos] == ids))

        sm = (
            docs.select_columns([id_col, text_col])
            .map_batches(pick, batch_format="pyarrow")
            .to_pandas()
            .sort_values(id_col)
        )
        ids_ref = _ray.put(sm[id_col].to_numpy())
        txt_ref = _ray.put(sm[text_col].to_numpy(dtype=object))

        def attach(b: pd.DataFrame) -> pd.DataFrame:
            ids = _ray.get(ids_ref)
            txts = _ray.get(txt_ref)
            ia = np.minimum(
                np.searchsorted(ids, b["id_a"].to_numpy()), len(ids) - 1
            )
            ib = np.minimum(
                np.searchsorted(ids, b["id_b"].to_numpy()), len(ids) - 1
            )
            # inner-join semantics: drop pairs whose doc is absent
            ok = (ids[ia] == b["id_a"].to_numpy()) & (
                ids[ib] == b["id_b"].to_numpy()
            )
            return pd.DataFrame(
                {
                    "id_a": b["id_a"].to_numpy()[ok],
                    "id_b": b["id_b"].to_numpy()[ok],
                    "text_a": txts[ia[ok]],
                    "text_b": txts[ib[ok]],
                }
            )

        j = pairs.map_batches(attach, batch_format="pandas")
    else:
        ta = _attach_side(
            docs, id_col, text_col, "id_a", "text_a", payload_type=text_t
        )
        tb = _attach_side(
            docs, id_col, text_col, "id_b", "text_b", payload_type=text_t
        )
        j = pairs.join(ta, "inner", num_partitions=num_partitions, on=("id_a",))
        j = j.join(tb, "inner", num_partitions=num_partitions, on=("id_b",))

    def kernel(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {
                    "id_a": b["id_a"],
                    "id_b": b["id_b"],
                    "jaccard": pd.Series([], dtype="float64"),
                }
            )
        sa = _shingle_id_sets(b["text_a"].reset_index(drop=True), k)
        sb = _shingle_id_sets(b["text_b"].reset_index(drop=True), k)
        inter = np.fromiter(
            (
                len(np.intersect1d(x, y, assume_unique=True))
                for x, y in zip(sa, sb)
            ),
            dtype=np.int64,
            count=len(sa),
        )
        uni = (
            np.fromiter((len(x) for x in sa), dtype=np.int64, count=len(sa))
            + np.fromiter((len(y) for y in sb), dtype=np.int64, count=len(sb))
            - inter
        )
        jac = np.where(uni > 0, inter / np.maximum(uni, 1), 0.0)
        keep = jac >= threshold
        return pd.DataFrame(
            {
                "id_a": b["id_a"].to_numpy()[keep],
                "id_b": b["id_b"].to_numpy()[keep],
                "jaccard": jac[keep],
            }
        )

    return j.map_batches(kernel, batch_format="pandas")


# ---------------------------------------------------------------------------
# exact n-gram Jaccard verification
# ---------------------------------------------------------------------------


def ngram_jaccard_verify(
    pairs_df: pd.DataFrame,
    docs_df: pd.DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.8,
) -> pd.DataFrame:
    """Exact k-gram Jaccard for candidate pairs — the small in-memory
    helper (tests, tiny candidate sets). The distributed version that
    joins texts onto pairs and verifies inside map_batches is
    ``ngram_jaccard_verify_ds`` (the gated dedup_lsh_verified path)."""
    wh, off = hashing.tokenize_words(docs_df[text_col])
    sh, soff = hashing.shingle_hashes(wh, off, k=k)
    sets = {
        docs_df[id_col].iloc[i]: set(sh[soff[i] : soff[i + 1]].tolist())
        for i in range(len(docs_df))
    }
    jac = []
    for a, b in zip(pairs_df["id_a"], pairs_df["id_b"]):
        sa, sb = sets.get(a, set()), sets.get(b, set())
        union = len(sa | sb)
        jac.append(len(sa & sb) / union if union else 0.0)
    out = pairs_df.copy()
    out["jaccard"] = jac
    out["is_dup"] = out["jaccard"] >= threshold
    return out


def incremental_dedup_keep_ids(
    new_docs: "ray.data.Dataset",
    corpus: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int = 8,
    normalize=None,
) -> "ray.data.Dataset":
    """Ingestion-time exact dedup: ids of NEW documents that survive
    against an EXISTING corpus — the shape a production pipeline runs
    every batch (dedup the increment, never re-shuffle the corpus it
    already ingested).

    A new doc is kept iff (a) its content hash does not occur in the
    corpus and (b) it is the min-id holder of its hash within the new
    batch. Only (hash, id) projections of BOTH sides move: the within-
    batch winner comes from the sorted-run min (exact_dedup_keep_ids
    machinery) and the corpus check is a hash left_anti join keyed on
    the 64-bit content hash — corpus text never leaves its blocks."""
    new_rows = new_docs.map_batches(
        _content_hash_batch(id_col, text_col, normalize), batch_format="pandas"
    )
    corpus_hashes = (
        corpus.map_batches(
            lambda b, _f=_content_hash_batch(id_col, text_col, normalize): _f(b)[
                ["content_hash"]
            ],
            batch_format="pandas",
        )
        # batch-local dedup before the shuffle: at most one row per
        # distinct hash per block reaches the join
        .map_batches(
            lambda b: b.drop_duplicates("content_hash"), batch_format="pandas"
        )
    )
    winners = sorted_group_first(new_rows, ["content_hash"], id_col)
    return (
        winners.repartition(num_partitions)  # sort/union empties (NOTES)
        .join(
            corpus_hashes.map_batches(
                lambda b: b.rename(columns={"content_hash": "seen_hash"}),
                batch_format="pandas",
            ).repartition(num_partitions),
            "left_anti",
            num_partitions=num_partitions,
            on=("content_hash",),
            right_on=("seen_hash",),
        )
        .select_columns([id_col])
    )
