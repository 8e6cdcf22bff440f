"""Exact repeated-substring detection across documents.

The character-level complement of the shingle dedup families (the
published exact-substring dedup insight: long verbatim repeats across
training documents are memorization hazards even when whole-document
similarity is low). A doc is flagged when any of its ``w``-character
windows occurs verbatim in ANOTHER doc.

Shape, all house machinery:

1. per batch, EVERY stride-1 window of every doc is hashed with a
   vectorized Rabin-Karp prefix hash (uint64 wraparound polynomial:
   H[i..i+w) = P[i+w] - P[i]*B^w — one subtraction/multiply per
   window, no Python per-position loop), windows crossing doc
   boundaries masked out, then deduped per doc with the lexsort-mask
   pattern. Only distinct (window_hash, doc) pairs leave the worker.
2. distinct-doc counts per window hash via the sorted-run counter
   (``dedup.sorted_group_counts`` — high-cardinality safe); hashes
   with >= 2 docs form the shared-window set.
3. docs are flagged by membership of their pairs in that set —
   broadcast searchsorted when it fits, hash semi-join beyond
   (the prepare/keep_canonical adaptive discipline).

Hash collisions can merge two distinct windows (~2^-64): the flag is
probabilistically exact, same contract as the minhash family.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data

from . import dedup

_B = np.uint64(1099511628211)  # FNV prime as polynomial base (odd)


def _window_hashes(texts: pd.Series, w: int) -> tuple[np.ndarray, np.ndarray]:
    """(flat window hashes, per-doc offsets) for every stride-1
    w-char window of every doc; docs shorter than w contribute none."""
    joined = "".join(texts.fillna("").tolist())
    lens = texts.fillna("").str.len().to_numpy(dtype=np.int64)
    n_docs = len(lens)
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=np.uint64), np.zeros(n_docs + 1, dtype=np.int64)
    codes = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32).astype(
        np.uint64
    )
    # Fully vectorized polynomial window hashes via the modular-inverse
    # trick (no per-character Python loop): with Binv = B^-1 mod 2^64
    # (B is odd, so invertible), define Q[i] = sum_{j<i} c[j]*Binv^j —
    # a wraparound cumsum — then
    #   H(s) = (Q[s+w] - Q[s]) * B^s = sum_{j=s}^{s+w-1} c[j]*Binv^(j-s),
    # a shift-invariant window fingerprint (a polynomial in B^-1 —
    # equally collision-resistant; only the base differs from the
    # textbook forward form). Powers come from
    # np.multiply.accumulate (C-speed, wraps mod 2^64 like everything
    # here).
    binv = pow(int(_B), -1, 1 << 64)
    bpow = np.ones(total + 1, dtype=np.uint64)
    np.multiply.accumulate(np.full(total, _B, dtype=np.uint64), out=bpow[1:])
    binvpow = np.ones(total, dtype=np.uint64)
    if total > 1:
        np.multiply.accumulate(
            np.full(total - 1, np.uint64(binv), dtype=np.uint64), out=binvpow[1:]
        )
    q = np.zeros(total + 1, dtype=np.uint64)
    np.cumsum(codes * binvpow, out=q[1:])
    doc_off = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(lens, out=doc_off[1:])
    # window start positions valid within a doc
    starts = np.arange(total - w + 1, dtype=np.int64) if total >= w else np.empty(0, dtype=np.int64)
    if len(starts) == 0:
        return np.empty(0, dtype=np.uint64), np.zeros(n_docs + 1, dtype=np.int64)
    doc_of = np.searchsorted(doc_off, starts, side="right") - 1
    valid = starts + w <= doc_off[doc_of + 1]
    s = starts[valid]
    h = (q[s + w] - q[s]) * bpow[s]
    d = doc_of[valid]
    counts = np.bincount(d, minlength=n_docs)
    offs = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(counts, out=offs[1:])
    return h, offs


def repeated_substring_docs(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    w: int = 40,
    broadcast_limit: int = 5_000_000,
) -> "ray.data.Dataset":
    """(id, n_shared_windows): per doc, how many of its DISTINCT
    w-char windows occur verbatim in at least one OTHER doc (0 = no
    verbatim repeats). Flag = n_shared_windows > 0."""

    def pairs_fn(b: pd.DataFrame) -> pd.DataFrame:
        h, offs = _window_hashes(b[text_col], w)
        ids = b[id_col].to_numpy()
        doc_of = np.repeat(np.arange(len(b)), np.diff(offs))
        if len(h) == 0:
            return pd.DataFrame(
                {"h": pd.Series([], dtype="uint64"), id_col: ids[:0]}
            )
        order = np.lexsort((h, doc_of))
        ds_, hs_ = doc_of[order], h[order]
        first = np.ones(len(hs_), dtype=bool)
        first[1:] = (hs_[1:] != hs_[:-1]) | (ds_[1:] != ds_[:-1])
        return pd.DataFrame({"h": hs_[first], id_col: ids[ds_[first]]})

    from . import drop_empty_blocks

    # drop zero-row blocks (docs blocks shorter than w emit none):
    # a single empty block makes every downstream map stage emit a
    # schema-less block and defeats the executor's schema dedup
    pairs = drop_empty_blocks(
        ds.map_batches(pairs_fn, batch_format="pandas").materialize()
    )
    # Adaptive distinct-doc counts (the q3/qsketch pattern): the pairs
    # projection is 16 B/row, so <= broadcast_limit rows sort in ONE
    # task — skips the range-sort exchange's ~2s fixed cost. The
    # window-hashing scan above stays fully distributed either way.
    if pairs.count() <= broadcast_limit:

        def count_one(b: pd.DataFrame) -> pd.DataFrame:
            h = np.sort(b["h"].to_numpy(dtype=np.uint64))
            if len(h) == 0:
                return pd.DataFrame(
                    {
                        "h": pd.Series([], dtype="uint64"),
                        "n": pd.Series([], dtype="int64"),
                    }
                )
            change = np.ones(len(h), dtype=bool)
            change[1:] = h[1:] != h[:-1]
            starts = np.flatnonzero(change)
            runs = np.diff(np.append(starts, len(h)))
            return pd.DataFrame({"h": h[starts], "n": runs.astype("int64")})

        counts = (
            pairs.map_batches(lambda b: b[["h"]], batch_format="pandas")
            .repartition(1)
            .map_batches(count_one, batch_format="pandas")
        )
    else:
        counts = dedup.sorted_group_counts(
            pairs.map_batches(lambda b: b[["h"]], batch_format="pandas"),
            ["h"],
            alias="n",
        )
    shared = drop_empty_blocks(
        counts.map_batches(
            lambda b: b[b["n"].astype("int64") >= 2][["h"]],
            batch_format="pandas",
        ).materialize()
    )

    n_shared = shared.count()
    if n_shared <= broadcast_limit:
        arr = (
            np.sort(shared.to_pandas()["h"].to_numpy(dtype=np.uint64))
            if n_shared
            else np.empty(0, dtype=np.uint64)
        )
        ref = ray.put(arr)

        def count_hits(b: pd.DataFrame) -> pd.DataFrame:
            a = ray.get(ref)
            out = pd.DataFrame({id_col: b[id_col]})
            if len(a) == 0 or len(b) == 0:
                out["_hit"] = np.zeros(len(b), dtype=np.int64)
            else:
                v = b["h"].to_numpy(dtype=np.uint64)
                pos = np.minimum(np.searchsorted(a, v), len(a) - 1)
                out["_hit"] = (a[pos] == v).astype(np.int64)
            # only hit rows go on: the final left_outer join fills the
            # zeros, and shared windows are typically <1% of pairs —
            # keeping misses would sort the whole pair stream for
            # nothing (~100x the volume at the 200k-doc probe)
            return out[out["_hit"] == 1][[id_col, "_hit"]]

        hits = pairs.map_batches(count_hits, batch_format="pandas")
    else:
        probe = shared.map_batches(
            lambda b: b.rename(columns={"h": "sh"}), batch_format="pandas"
        )
        from . import default_join_partitions

        hits = pairs.join(
            probe.repartition(default_join_partitions()),
            "left_semi",
            num_partitions=default_join_partitions(),
            on=("h",),
            right_on=("sh",),
        ).map_batches(
            lambda b: b.assign(_hit=np.int64(1))[[id_col, "_hit"]],
            batch_format="pandas",
        )

    # per-doc totals: docs are whole within source batches but hit rows
    # may split; sum via the sorted-run counter machinery
    from .groupagg import sorted_group_sum

    # NOTE: both branches already emit exactly [id_col, "_hit"] — no
    # extra projection map here: fusing a map after a stage that can
    # emit EMPTY batches makes Ray skip the fused UDF and emit a
    # schema-less block (the "different schema" warning family)
    hits = drop_empty_blocks(hits.materialize())
    if hits.count() == 0:
        # nothing shared anywhere: an all-empty right side would reach
        # the join as schema-less blocks (the NOTES landmine) — emit
        # zeros for every doc directly
        return ds.map_batches(
            lambda b: pd.DataFrame(
                {
                    id_col: b[id_col].to_numpy(),
                    "n_shared_windows": np.zeros(len(b), dtype=np.int64),
                }
            ),
            batch_format="pandas",
        )
    # Adaptive per-doc totals: hit rows are typically <1% of pairs, so
    # a one-task pandas groupby beats the sorted_group_sum exchange's
    # fixed cost; past the limit, the distributed sorted-run sum.
    if hits.count() <= broadcast_limit:
        sums = hits.repartition(1).map_batches(
            lambda b: b.groupby(id_col, as_index=False)["_hit"]
            .sum()
            .rename(columns={"_hit": "n_shared_windows"}),
            batch_format="pandas",
        ).materialize()
    else:
        # sorted_group_sum's union carries typed-empty "done" blocks (a
        # block whose runs were all edges filters to zero rows); any map
        # over them is skipped by Ray and emits a schema-less block, so
        # rebuild the block list first (the sums table is per-hit-doc ints)
        sums = drop_empty_blocks(
            sorted_group_sum(
                hits, [id_col], "_hit", alias="n_shared_windows"
            ).materialize()
        )
    # zero-fill: every doc needs a row, including docs shorter than w
    # and docs with no shared windows. Adaptive: a small per-hit-doc
    # sums table (2 ints per hit doc) broadcasts and fills in ONE map
    # over the docs — no repartition, no join, no extra materialize of
    # an all-docs table; past the limit, the left_outer join path.
    n_hit_docs = sums.count()
    if n_hit_docs <= broadcast_limit:
        sdf = sums.to_pandas().sort_values(id_col)
        sums_ref = ray.put(
            (
                sdf[id_col].to_numpy(),
                sdf["n_shared_windows"].to_numpy(dtype=np.int64),
            )
        )

        def fill(b: pd.DataFrame) -> pd.DataFrame:
            sid, sn = ray.get(sums_ref)
            ids = b[id_col].to_numpy()
            out = np.zeros(len(b), dtype=np.int64)
            if len(sid) and len(ids):
                pos = np.minimum(np.searchsorted(sid, ids), len(sid) - 1)
                hit = sid[pos] == ids
                out[hit] = sn[pos[hit]]
            return pd.DataFrame({id_col: ids, "n_shared_windows": out})

        return ds.map_batches(
            lambda b: b[[id_col]], batch_format="pandas"
        ).map_batches(fill, batch_format="pandas")

    from . import default_join_partitions

    np_join = default_join_partitions()
    all_ids = ds.map_batches(
        lambda b: b[[id_col]], batch_format="pandas"
    )
    joined = all_ids.join(
        sums.map_batches(
            lambda b: b.assign(n_shared_windows=b["n_shared_windows"].astype("int64")),
            batch_format="pandas",
        ).repartition(np_join),
        "left_outer",
        num_partitions=np_join,
        on=(id_col,),
    )
    # a hash partition with no matching ids emits an EMPTY join block;
    # fused maps skip empty batches and emit schema-less blocks, so
    # rebuild the block list before the fill-zeros projection (the
    # joined table is 2 ints per doc — tiny next to the pair stream)
    joined = drop_empty_blocks(joined.materialize())
    return joined.map_batches(
        lambda b: pd.DataFrame(
            {
                id_col: b[id_col].to_numpy(),
                "n_shared_windows": b["n_shared_windows"]
                .fillna(0)
                .astype("int64")
                .to_numpy(),
            }
        ),
        batch_format="pandas",
    )
