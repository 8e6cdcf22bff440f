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


def bigram_logprob_scores(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_k: int = 1000,
    lam: float = 0.7,
) -> "ray.data.Dataset":
    """(id_col, lm2_score): mean ln of the INTERPOLATED bigram model
    over each document's adjacent word pairs,

        p(cur | prev) = lam * c(prev,cur)/c(prev) + (1-lam) * p_uni(cur)

    with both models estimated from the corpus itself (the KenLM-style
    quality filter one order up from unigram_logprob_scores). Bigram
    mass exists only when BOTH words sit in the top-K unigram vocab —
    that bounds the bigram table at K^2 entries regardless of corpus
    size — and p_uni falls back to the 1/N floor out of vocab.
    Documents with fewer than two words score the no-evidence floor
    ln((1-lam)/N).

    Passes: token totals (O(1) rows/block), unigram vocab (sorted
    runs + partial top-k), vocab-restricted bigram counts (sorted
    runs over (w1, w2) — only vocab-pair rows shuffle), then one
    broadcast-table scoring pass (two pandas merges per batch; raw
    text never shuffles)."""

    # totals + unigram vocab (same machinery as the unigram scorer)
    def token_partial(b: pd.DataFrame) -> pd.DataFrame:
        _, counts = explode_words(b[text_col])
        return pd.DataFrame({"n": [int(counts.sum())]})

    n_total = int(
        ds.map_batches(token_partial, batch_format="pandas").to_pandas()["n"].sum()
    )
    floor_term = float(np.log((1.0 - lam) * (1.0 / max(n_total, 1))))
    if n_total == 0:
        def empty(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {id_col: b[id_col], "lm2_score": np.zeros(len(b))}
            )

        return ds.map_batches(empty, batch_format="pandas")

    def word_rows(b: pd.DataFrame) -> pd.DataFrame:
        flat, _ = explode_words(b[text_col])
        return pd.DataFrame({"word": flat})

    counts = dedup.sorted_group_counts(
        ds.map_batches(word_rows, batch_format="pandas"), ["word"], alias="c"
    )

    def cast(b: pd.DataFrame) -> pd.DataFrame:
        b["c"] = b["c"].astype("int64")
        return b

    vocab = topk.topk(
        counts.map_batches(cast, batch_format="pandas"),
        sort_cols=["c", "word"],
        k=vocab_k,
        descending=[True, False],
    ).to_pandas()
    import ray as _ray

    vocab_ref = _ray.put(
        {w: int(c) for w, c in zip(vocab["word"], vocab["c"])}
    )

    # vocab-restricted bigram counts: only (w1, w2) pairs with both
    # words in vocab leave the block (<= K^2 distinct keys globally)
    def bigram_rows(b: pd.DataFrame) -> pd.DataFrame:
        voc = _ray.get(vocab_ref)
        flat, counts_ = explode_words(b[text_col])
        doc_of = np.repeat(np.arange(len(b)), counts_)
        if len(flat) == 0:
            return pd.DataFrame({"w1": [], "w2": []}).astype(str)
        same = doc_of[1:] == doc_of[:-1]
        w1 = flat[:-1][same]
        w2 = flat[1:][same]
        inv = pd.Series(w1).isin(voc).to_numpy() & pd.Series(w2).isin(voc).to_numpy()
        return pd.DataFrame({"w1": w1[inv], "w2": w2[inv]})

    bc = dedup.sorted_group_counts(
        ds.map_batches(bigram_rows, batch_format="pandas"), ["w1", "w2"], alias="c12"
    ).to_pandas()
    bc["c12"] = bc["c12"].astype("int64")
    bc = bc.groupby(["w1", "w2"], as_index=False)["c12"].sum()
    bigram_ref = _ray.put(bc)

    def score(b: pd.DataFrame) -> pd.DataFrame:
        voc = _ray.get(vocab_ref)
        bct = _ray.get(bigram_ref)
        flat, counts_ = explode_words(b[text_col])
        doc_of = np.repeat(np.arange(len(b)), counts_)
        out = np.full(len(b), floor_term, dtype=np.float64)
        if len(flat) > 1:
            same = doc_of[1:] == doc_of[:-1]
            if same.any():
                pairs = pd.DataFrame(
                    {
                        "doc": doc_of[1:][same],
                        "w1": flat[:-1][same],
                        "w2": flat[1:][same],
                    }
                )
                m = pairs.merge(bct, on=["w1", "w2"], how="left")
                c1 = m["w1"].map(voc).to_numpy(dtype=np.float64)
                c2 = m["w2"].map(voc).to_numpy(dtype=np.float64)
                c12 = m["c12"].to_numpy(dtype=np.float64)
                p_bi = np.where(
                    np.isnan(c12) | np.isnan(c1), 0.0,
                    np.nan_to_num(c12) / np.where(np.isnan(c1), 1.0, c1),
                )
                p_uni = np.where(
                    np.isnan(c2), 1.0 / n_total, c2 / n_total
                )
                term = np.log(lam * p_bi + (1.0 - lam) * p_uni)
                sums = np.bincount(
                    m["doc"].to_numpy(), weights=term, minlength=len(b)
                )
                cnts = np.bincount(m["doc"].to_numpy(), minlength=len(b))
                has = cnts > 0
                out[has] = sums[has] / cnts[has]
        return pd.DataFrame(
            {id_col: b[id_col].to_numpy(), "lm2_score": np.round(out, 6)}
        )

    return ds.map_batches(score, batch_format="pandas")
