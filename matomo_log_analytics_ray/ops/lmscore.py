"""Unigram language-model document scoring.

The corpus-statistics quality filter a training-data pipeline runs
when a real LM is too expensive (the KenLM-filter pattern, reduced to
unigrams): score every document by the mean log-probability of its
words under the corpus's own unigram distribution. Low scores flag
gibberish/OOV-heavy documents; high scores flag natural prose.

Three streaming passes, all scale-safe:

1. total-token pass   — per-block token-count partials (O(1) rows per
                        block), driver sum -> N.
2. vocab pass         — term counts via the sorted-run machinery
                        (ops/dedup.sorted_group_counts over exploded
                        words — high-cardinality safe), then partial
                        top-k (ops/topk.topk) keeps only the top
                        ``vocab_k`` words by (count desc, word asc).
                        Only K rows reach the driver.
3. scoring pass       — the K-word log-prob table broadcasts via the
                        closure (a few KB); each block scores its docs
                        vectorized (pandas map on the exploded word
                        Series + bincount mean). OOV words get the
                        floor probability 1/N.

Words are the same [a-z0-9]+ lowercased tokens the rest of the text
stack uses. Deterministic: same corpus -> same vocab -> same scores,
on any partitioning.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data

from . import dedup, topk
from .textstats import explode_words


def unigram_logprob_scores(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_k: int = 1000,
) -> "ray.data.Dataset":
    """(id_col, lm_score): mean ln p(word) per document under the
    corpus unigram distribution; OOV floor ln(1/N). Documents with no
    words score the floor."""
    # pass 1: N = total tokens (per-block partial sums)
    def token_partial(b: pd.DataFrame) -> pd.DataFrame:
        _, counts = explode_words(b[text_col])
        return pd.DataFrame({"n": [int(counts.sum())]})

    n_total = int(
        ds.map_batches(token_partial, batch_format="pandas").to_pandas()["n"].sum()
    )
    if n_total == 0:
        def empty(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {id_col: b[id_col], "lm_score": np.zeros(len(b))}
            )

        return ds.map_batches(empty, batch_format="pandas")

    # pass 2: top-K vocab by term frequency
    def word_rows(b: pd.DataFrame) -> pd.DataFrame:
        flat, _ = explode_words(b[text_col])
        return pd.DataFrame({"word": flat})

    counts = dedup.sorted_group_counts(
        ds.map_batches(word_rows, batch_format="pandas"), ["word"], alias="c"
    )

    def cast(b: pd.DataFrame) -> pd.DataFrame:
        b["c"] = b["c"].astype("int64")
        return b

    vocab = (
        topk.topk(
            counts.map_batches(cast, batch_format="pandas"),
            sort_cols=["c", "word"],
            k=vocab_k,
            descending=[True, False],
        )
        .to_pandas()
    )
    logp = {
        w: float(np.log(c / np.float64(n_total)))
        for w, c in zip(vocab["word"], vocab["c"])
    }
    floor = float(np.log(1.0 / np.float64(n_total)))

    # pass 3: vectorized per-doc mean log-prob
    def score(b: pd.DataFrame) -> pd.DataFrame:
        flat, counts_ = explode_words(b[text_col])
        doc_of = np.repeat(np.arange(len(b)), counts_)
        lp = pd.Series(flat).map(logp).fillna(floor).to_numpy(dtype=np.float64)
        sums = np.bincount(doc_of, weights=lp, minlength=len(b))
        mean = np.where(counts_ > 0, sums / np.maximum(counts_, 1), floor)
        return pd.DataFrame(
            {id_col: b[id_col].to_numpy(), "lm_score": np.round(mean, 6)}
        )

    return ds.map_batches(score, batch_format="pandas")
