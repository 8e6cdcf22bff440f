"""Paragraph-level exact deduplication with document reassembly
(the RefinedWeb / CCNet paragraph-dedup shape): split every document
into fixed word-window "paragraphs", keep only the FIRST occurrence of
each distinct paragraph corpus-wide (ordered by (doc_id, idx)), and
re-assemble each document from its surviving paragraphs in order.

Pipeline shape (all distributed, no driver-side row data):

1. ``paragraph_rows`` — stateless fan-out: (doc_id, idx, para) rows,
   one ``map_batches`` pass (ragged substring extraction is per-
   paragraph, ~1/para_words of the word count — same tradeoff as
   ops/chunk).
2. first-occurrence winners — only (para_hash, doc_id, idx) int64
   projections shuffle through ``sorted_group_first``; paragraph TEXT
   never enters the dedup shuffle.
3. one hash join on (doc_id, idx) re-attaches text to the winners.
4. ``grouped_concat`` — ordered string_agg per doc via sorted runs:
   interior runs concatenate in-block; each block's first/last run
   forwards ONE pre-concatenated (key, min_order, partial) row, so
   the merge pass sees O(blocks) rows.  A single document is the
   worst-case merge unit — bounded by the largest doc, which must fit
   in memory anywhere anyway.

Beyond-reference op (SURVEY.md "beyond-reference" family): the
reference control plane never touches payload text.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from . import default_join_partitions
from .dedup import sorted_group_first
from .hashing import hash_strings


def paragraph_batch(
    b: pd.DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    para_words: int = 10,
) -> pd.DataFrame:
    """(id, idx, para): consecutive ``para_words``-word windows (last
    window may be shorter). Split semantics match SQL's
    string_split(coalesce(text,''), ' '): an empty/NULL doc has ONE
    word ('') and so emits one '' paragraph; a whitespace-only doc
    emits its (empty-word) windows — docs never silently vanish."""
    words = b[text_col].fillna("").str.split(" ")
    counts = words.str.len().to_numpy(dtype=np.int64)
    n_paras = (counts + para_words - 1) // para_words
    doc_of = np.repeat(np.arange(len(b)), n_paras)
    run_starts = np.concatenate([[0], np.cumsum(n_paras)[:-1]])
    idx = np.arange(len(doc_of)) - run_starts[doc_of]
    wlists = words.to_numpy()
    paras = [
        " ".join(wlists[d][i * para_words : (i + 1) * para_words])
        for d, i in zip(doc_of, idx)
    ]
    return pd.DataFrame(
        {
            id_col: b[id_col].to_numpy()[doc_of],
            "idx": idx.astype("int64"),
            "para": pd.Series(paras, dtype=object),
        }
    )


def paragraph_rows(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    para_words: int = 10,
) -> "ray.data.Dataset":
    return ds.map_batches(
        lambda b: paragraph_batch(b, id_col, text_col, para_words),
        batch_format="pandas",
    )


def grouped_concat(
    rows: "ray.data.Dataset",
    key_cols: list[str],
    order_col: str,
    val_col: str,
    sep: str = " ",
    out_col: str = "text",
) -> "ray.data.Dataset":
    """string_agg(val, sep ORDER BY order_col) per key for HIGH-
    CARDINALITY keys: sort by (key, order), concatenate interior runs
    in-block, forward each block's first/last run as ONE pre-joined
    (key, min_order, partial) edge row; the single merge pass orders
    partials by min_order (sorted blocks are order-disjoint per key,
    so partial order == min_order order) and joins them."""
    sorted_ds = rows.sort([*key_cols, order_col])

    def block_fn(b: pd.DataFrame) -> pd.DataFrame:
        n = len(b)
        if n == 0:
            out = {c: pd.Series([], dtype=b[c].dtype) for c in key_cols}
            out["_ord"] = pd.Series([], dtype="int64")
            out[out_col] = pd.Series([], dtype=object)
            out["kind"] = pd.Series([], dtype=object)
            return pd.DataFrame(out)
        change = np.zeros(n, dtype=bool)
        change[0] = True
        for c in key_cols:
            v = b[c].to_numpy()
            change[1:] |= v[1:] != v[:-1]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], n)
        last = len(starts) - 1
        vals = b[val_col].astype(object).to_numpy()
        joined = [sep.join(vals[s:e]) for s, e in zip(starts, ends)]
        interior = (np.arange(last + 1) != 0) & (np.arange(last + 1) != last)
        out = b.iloc[starts[interior]][key_cols].copy()
        out["_ord"] = b[order_col].to_numpy()[starts[interior]].astype("int64")
        out[out_col] = [j for j, k in zip(joined, interior) if k]
        out["kind"] = "done"
        edge_runs = [0] if last == 0 else [0, last]
        edges = b.iloc[[starts[r] for r in edge_runs]][key_cols].copy()
        edges["_ord"] = (
            b[order_col].to_numpy()[[starts[r] for r in edge_runs]].astype("int64")
        )
        edges[out_col] = [joined[r] for r in edge_runs]
        edges["kind"] = "edge"
        return pd.concat([out, edges], ignore_index=True)

    tagged = sorted_ds.map_batches(block_fn, batch_format="pandas").materialize()
    done = tagged.map_batches(
        lambda b: b[b["kind"] == "done"][[*key_cols, out_col]],
        batch_format="pandas",
    )

    def edge_merge(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            out = {c: pd.Series([], dtype=b[c].dtype) for c in key_cols}
            out[out_col] = pd.Series([], dtype=object)
            return pd.DataFrame(out)
        b = b.sort_values([*key_cols, "_ord"], kind="mergesort")
        g = b.groupby(key_cols, as_index=False, sort=False)[out_col].agg(
            sep.join
        )
        return g[[*key_cols, out_col]]

    edges = (
        tagged.map_batches(
            lambda b: b[b["kind"] == "edge"][[*key_cols, "_ord", out_col]],
            batch_format="pandas",
        )
        .repartition(1)
        .map_batches(edge_merge, batch_format="pandas")
    )
    return done.union(edges)


def paragraph_dedup(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    para_words: int = 10,
) -> "ray.data.Dataset":
    """(id, text) with every non-first occurrence of each distinct
    paragraph removed; docs whose every paragraph is a repeat drop out
    entirely."""
    np_join = default_join_partitions()
    paras = paragraph_rows(ds, id_col, text_col, para_words).materialize()
    if paras.count() == 0:  # empty/whitespace-only corpus: no joins
        return ray.data.from_pandas(
            pd.DataFrame(
                {
                    id_col: pd.Series([], dtype="int64"),
                    text_col: pd.Series([], dtype=object),
                }
            )
        )

    def proj(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "h": hash_strings(b["para"]).astype("uint64"),
                id_col: b[id_col].to_numpy(),
                "idx": b["idx"].to_numpy(),
            }
        )

    winners = sorted_group_first(
        paras.map_batches(proj, batch_format="pandas"),
        ["h"],
        [id_col, "idx"],
    )
    kept = winners.select_columns([id_col, "idx"]).repartition(np_join)
    attached = paras.repartition(np_join).join(
        kept, "inner", num_partitions=np_join, on=(id_col, "idx")
    )
    return grouped_concat(
        attached, [id_col], "idx", "para", sep=" ", out_col=text_col
    )
