"""DSIR-style importance weighting for data selection.

Public method (Xie et al. 2023, "Data Selection for Language Models
via Importance Resampling", arXiv:2302.03169), reduced to the
SQL-replayable unigram form the rest of this repo's LM family uses
(ops/lmscore.py): weight every document by how much more likely its
tokens are under a TARGET distribution (e.g. curated / in-domain
docs) than under the RAW corpus distribution,

    dsir_weight(d) = mean over tokens w of [ ln p_t(w) - ln p_r(w) ]

with both unigram models estimated from the same corpus scan: p_r
from all docs, p_t from the docs matching a target predicate (here: a
column equality, e.g. lang = 'en'). Vocabulary is the top-K words by
RAW count (deterministic ties by word); out-of-vocab words and
zero-target-count vocab words take the floor 1/N of their model.
Documents with no tokens score the floor difference. Resampling
itself (keep the top quantile / Gumbel-top-k) composes downstream
with ops/quantiles + a broadcast filter, like lm_quality_filter.

Scale shape: one token-count pass (O(1) rows per block), ONE shared
vocab shuffle counting raw and target occurrences together
(ops/groupagg.sorted_group_sum with two measures — not one shuffle
per model), then a broadcast two-column log-prob table and a
vectorized scoring pass. Raw text never shuffles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data

from . import topk
from .groupagg import sorted_group_sum
from .textstats import explode_words


def dsir_weights(
    ds: "ray.data.Dataset",
    target_col: str,
    target_value,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_k: int = 1000,
) -> "ray.data.Dataset":
    """(id_col, dsir_weight): mean per-token log-likelihood ratio of
    the target unigram model over the raw model (6 dp)."""

    # pass 1: token totals, raw and target, from per-block partials
    def token_partial(b: pd.DataFrame) -> pd.DataFrame:
        _, counts = explode_words(b[text_col])
        tgt = (b[target_col] == target_value).to_numpy()
        return pd.DataFrame(
            {
                "n": [int(counts.sum())],
                "nt": [int(counts[tgt].sum())],
            }
        )

    totals = ds.map_batches(token_partial, batch_format="pandas").to_pandas()
    n_raw = int(totals["n"].sum())
    n_tgt = int(totals["nt"].sum())
    if n_raw == 0 or n_tgt == 0:
        # no tokens (or an empty target slice): every doc scores 0 —
        # there is no evidence to reweight on
        def zero(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {id_col: b[id_col], "dsir_weight": np.zeros(len(b))}
            )

        return ds.map_batches(zero, batch_format="pandas")

    # pass 2: ONE vocab shuffle carrying both measures per word
    def word_rows(b: pd.DataFrame) -> pd.DataFrame:
        flat, counts = explode_words(b[text_col])
        doc_of = np.repeat(np.arange(len(b)), counts)
        tgt = (b[target_col] == target_value).to_numpy()[doc_of]
        return pd.DataFrame(
            {"word": flat, "one": np.ones(len(flat)), "t": tgt.astype(np.float64)}
        )

    counts = sorted_group_sum(
        ds.map_batches(word_rows, batch_format="pandas"),
        ["word"],
        ["one", "t"],
        alias=["c", "ct"],
    )

    def cast(b: pd.DataFrame) -> pd.DataFrame:
        b["c"] = b["c"].astype("int64")
        b["ct"] = b["ct"].astype("int64")
        return b

    vocab = topk.topk(
        counts.map_batches(cast, batch_format="pandas"),
        sort_cols=["c", "word"],
        k=vocab_k,
        descending=[True, False],
    ).to_pandas()

    lp_raw = np.log(vocab["c"].to_numpy(np.float64) / np.float64(n_raw))
    ct = vocab["ct"].to_numpy(np.float64)
    lp_tgt = np.where(
        ct > 0,
        np.log(np.maximum(ct, 1.0) / np.float64(n_tgt)),
        np.log(1.0 / np.float64(n_tgt)),
    )
    ratio = {
        w: float(t - r) for w, t, r in zip(vocab["word"], lp_tgt, lp_raw)
    }
    floor = float(np.log(1.0 / np.float64(n_tgt)) - np.log(1.0 / np.float64(n_raw)))

    # pass 3: vectorized per-doc mean log-ratio
    def score(b: pd.DataFrame) -> pd.DataFrame:
        flat, counts_ = explode_words(b[text_col])
        doc_of = np.repeat(np.arange(len(b)), counts_)
        lr = pd.Series(flat).map(ratio).fillna(floor).to_numpy(dtype=np.float64)
        sums = np.bincount(doc_of, weights=lr, minlength=len(b))
        mean = np.where(counts_ > 0, sums / np.maximum(counts_, 1), floor)
        return pd.DataFrame(
            {id_col: b[id_col].to_numpy(), "dsir_weight": np.round(mean, 6)}
        )

    return ds.map_batches(score, batch_format="pandas")
