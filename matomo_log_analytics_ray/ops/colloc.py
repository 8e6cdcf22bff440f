"""Collocation mining: adjacent-bigram PMI over a document corpus.

The corpus-analysis op behind phrase detection / tokenizer-merge
candidates (word2vec's phrase pass, BPE-merge shortlists): score every
adjacent word pair by pointwise mutual information

    pmi(a, b) = ln( (c_ab / N_big) / ((c_a / N_uni) * (c_b / N_uni)) )

where c_ab counts adjacent occurrences, c_a/c_b unigram occurrences,
N_big/N_uni the respective totals.

Shape: one map_batches pass emits PER-BATCH pre-reduced (w1, w2, n)
bigram partials and (w, n) unigram partials (each batch collapses to
its local vocabulary — the partial-combine discipline), then
ops/groupagg.sorted_group_sum folds them globally (sorted runs, edge
rows pre-reduced). The unigram table is vocabulary-bounded, so it
broadcasts once via ray.put and the PMI column is a vectorized
searchsorted lookup fused into the bigram scan — no join. At larger
vocabularies key the counts on uint64 word hashes and attach strings
only to the final rows (the ops/textstats.tfidf_top_terms pattern).

Tokenization matches the text-op family: lowercased [a-z0-9]+ runs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data

from . import groupagg

_TOKEN_RE = r"[a-z0-9]+"


def _bigram_partials(b: "pa.Table", text_col: str) -> "pa.Table":
    """Pre-reduced (w1, w2, n) adjacent-bigram counts of one Arrow
    batch: Arrow tokenize (ops/textstats.explode_words_arrow), pair
    hashes combined order-sensitively, one lexsort run-collapse — no
    pandas conversion and no string groupby (strings attach only to
    the run-start rows that leave the worker)."""
    import pyarrow as pa

    from . import hashing
    from .textstats import explode_words_arrow, hash_words_arrow

    empty = pa.table(
        {
            "w1": pa.array([], type=pa.string()),
            "w2": pa.array([], type=pa.string()),
            "n": pa.array([], type=pa.int64()),
        }
    )
    flat, doc = explode_words_arrow(b[text_col])
    if len(flat) < 2:
        return empty
    h = hash_words_arrow(flat)
    same_doc = doc[1:] == doc[:-1]
    if not same_doc.any():
        return empty
    lead = np.flatnonzero(same_doc)  # bigram start positions
    ph = hashing.combine(h[lead], h[lead + 1])
    order = np.argsort(ph, kind="stable")
    ph_ = ph[order]
    first = np.ones(len(ph_), dtype=bool)
    first[1:] = ph_[1:] != ph_[:-1]
    starts = np.flatnonzero(first)
    n = np.diff(np.append(starts, len(ph_))).astype(np.int64)
    pos = lead[order[starts]]
    return pa.table(
        {
            "w1": flat.take(pa.array(pos)),
            "w2": flat.take(pa.array(pos + 1)),
            "n": pa.array(n, type=pa.int64()),
        }
    )


def _unigram_partials(b: "pa.Table", text_col: str) -> "pa.Table":
    """Pre-reduced (w, n) unigram counts of one Arrow batch (same
    hash-sort run-collapse as the bigram pass)."""
    import pyarrow as pa

    from .textstats import explode_words_arrow, hash_words_arrow

    flat, _ = explode_words_arrow(b[text_col])
    if len(flat) == 0:
        return pa.table(
            {
                "w": pa.array([], type=pa.string()),
                "n": pa.array([], type=pa.int64()),
            }
        )
    h = hash_words_arrow(flat)
    order = np.argsort(h, kind="stable")
    h_ = h[order]
    first = np.ones(len(h_), dtype=bool)
    first[1:] = h_[1:] != h_[:-1]
    starts = np.flatnonzero(first)
    n = np.diff(np.append(starts, len(h_))).astype(np.int64)
    return pa.table(
        {
            "w": flat.take(pa.array(order[starts])),
            "n": pa.array(n, type=pa.int64()),
        }
    )


def pmi_collocations(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    min_count: int = 5,
) -> "ray.data.Dataset":
    """(w1, w2, n_ab, pmi): every adjacent bigram occurring at least
    ``min_count`` times, with its PMI (rounded to 6 dp so the value is
    comparison-stable). Sort/limit downstream for a top-k."""
    big = groupagg.sorted_group_sum(
        ds.map_batches(
            lambda b: _bigram_partials(b, text_col), batch_format="pyarrow"
        ),
        ["w1", "w2"],
        "n",
        alias="n",
    ).materialize()
    uni = groupagg.sorted_group_sum(
        ds.map_batches(
            lambda b: _unigram_partials(b, text_col), batch_format="pyarrow"
        ),
        ["w"],
        "n",
        alias="n",
    ).to_pandas()  # vocabulary-bounded
    n_uni = int(uni["n"].sum())
    # N_big = total adjacent-bigram occurrences (tiny driver fold over
    # the already-reduced bigram table)
    n_big = int(
        big.map_batches(
            lambda b: pd.DataFrame({"n": [int(b["n"].sum())]}),
            batch_format="pandas",
        )
        .to_pandas()["n"]
        .sum()
    )
    words = uni["w"].to_numpy(dtype=object)
    order = np.argsort(words)
    vocab_ref = ray.put(
        (words[order], uni["n"].to_numpy(dtype=np.float64)[order])
    )

    def score(b: pd.DataFrame) -> pd.DataFrame:
        vwords, vcounts = ray.get(vocab_ref)
        b = b[b["n"] >= min_count]
        if len(b) == 0:
            return pd.DataFrame(
                {
                    "w1": pd.Series([], dtype=object),
                    "w2": pd.Series([], dtype=object),
                    "n_ab": pd.Series([], dtype="int64"),
                    "pmi": pd.Series([], dtype="float64"),
                }
            )
        c1 = vcounts[np.searchsorted(vwords, b["w1"].to_numpy(dtype=object))]
        c2 = vcounts[np.searchsorted(vwords, b["w2"].to_numpy(dtype=object))]
        n_ab = b["n"].to_numpy(dtype=np.float64)
        pmi = np.log((n_ab / n_big) / ((c1 / n_uni) * (c2 / n_uni)))
        return pd.DataFrame(
            {
                "w1": b["w1"].to_numpy(dtype=object),
                "w2": b["w2"].to_numpy(dtype=object),
                "n_ab": n_ab.astype(np.int64),
                "pmi": np.round(pmi, 6),
            }
        )

    return big.map_batches(score, batch_format="pandas")
