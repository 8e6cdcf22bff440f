"""Text analysis operators: language-ID, quality scoring, token
counting, document fingerprinting.

All pure vectorized pandas/numpy kernels designed for map_batches; the
SQL-expressible pieces (token/char counts, ratios) carry DuckDB oracles
in __ray_entry__, the heuristic pieces (langid) are pytest-verified.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from . import hashing

# Small per-language stopword sets for an n-gram/stopword heuristic
# language ID (public-knowledge lists, truncated).
STOPWORDS = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "for", "with", "was"},
    "es": {"el", "la", "de", "que", "y", "en", "los", "del", "las", "por"},
    "pt": {"o", "a", "de", "que", "e", "do", "da", "em", "um", "para"},
}

# whitespace tokens plus a BPE-ish fallback: runs of letters, runs of
# digits, or single non-space symbols (RE2-safe, shared with tests)
RE_TOKEN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# union of all language stopwords, built once at import (quality_batch
# runs in the prepare pipeline's hot filter stage)
ALL_STOPWORDS = frozenset().union(*STOPWORDS.values())


def _arrow_text(batch: pd.DataFrame, text_col: str):
    """Null-filled pyarrow StringArray of the text column."""
    import pyarrow as pa
    import pyarrow.compute as pc

    return pc.fill_null(pa.array(batch[text_col], type=pa.string()), "")


def _arrow_alpha_words(t) -> tuple["object", np.ndarray]:
    """[a-z]+ runs of the lowercased text as a flat StringArray plus
    each word's source-row index (the explode_words_arrow pattern,
    letters-only variant shared by quality/langid)."""
    import pyarrow.compute as pc

    lists = pc.split_pattern_regex(pc.utf8_lower(t), "[^a-z]+")
    flat = pc.list_flatten(lists)
    parent = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
    mask = pc.not_equal(flat, "")
    keep = mask.to_numpy(zero_copy_only=False)
    return flat.filter(mask), parent.astype(np.int64)[keep]


def _stop_counts(flat, row_idx: np.ndarray, words, n_rows: int) -> np.ndarray:
    """Per-row count of flat words that are in ``words``."""
    import pyarrow as pa
    import pyarrow.compute as pc

    hit = pc.is_in(
        flat, value_set=pa.array(sorted(words))
    ).to_numpy(zero_copy_only=False)
    return np.bincount(row_idx[hit], minlength=n_rows).astype("int64")


def token_count_batch(batch: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Whitespace word count + BPE-ish subtoken count per doc.
    Arrow/RE2 kernels (count_substring_regex) — same engine as the
    DuckDB oracle's regexp_extract_all, ~2.5x the pandas .str path."""
    import pyarrow.compute as pc

    t = _arrow_text(batch, text_col)
    out = batch.copy()
    out["n_words"] = (
        pc.count_substring_regex(t, r"\S+").to_numpy().astype("int64")
    )
    out["n_tokens"] = (
        pc.count_substring_regex(t, RE_TOKEN).to_numpy().astype("int64")
    )
    return out


def quality_batch(batch: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Length / punctuation / stopword-ratio quality signals and a
    composite [0,1] score (long-enough, low-punct, high-stopword text
    scores high — the classic prose-vs-noise heuristic). Arrow/RE2
    kernels throughout — \\w and \\s are RE2's (ASCII) classes, the
    same engine the DuckDB oracle's regexp_extract_all uses."""
    import pyarrow.compute as pc

    t = _arrow_text(batch, text_col)
    n_chars = pc.utf8_length(t).to_numpy().astype("int64")
    n_words = pc.count_substring_regex(t, r"\S+").to_numpy().astype("int64")
    n_punct = (
        pc.count_substring_regex(t, r"[^\w\s]").to_numpy().astype("int64")
    )
    flat, row_idx = _arrow_alpha_words(t)
    n_stop = _stop_counts(flat, row_idx, ALL_STOPWORDS, len(batch))
    return _quality_finish(batch, n_chars, n_words, n_punct, n_stop)


def _quality_finish(
    batch: pd.DataFrame,
    n_chars: np.ndarray,
    n_words: np.ndarray,
    n_punct: np.ndarray,
    n_stop: np.ndarray,
) -> pd.DataFrame:
    out = batch.copy()
    out["n_chars"] = n_chars
    out["n_words"] = n_words
    nc1 = np.maximum(n_chars, 1)
    nw1 = np.maximum(n_words, 1)
    out["punct_ratio"] = np.round(n_punct / nc1, 6)
    out["stopword_ratio"] = np.round(n_stop / nw1, 6)
    out["mean_word_len"] = np.round(
        np.maximum(n_chars - n_words + 1, 0) / nw1, 6
    )
    len_score = np.minimum(n_words, 100) / 100
    punct_score = 1 - np.minimum(out["punct_ratio"].to_numpy(), 0.5) * 2
    stop_score = np.minimum(out["stopword_ratio"].to_numpy(), 0.5) * 2
    out["quality_score"] = np.round(
        (len_score + punct_score + stop_score) / 3, 6
    )
    return out


def char_entropy_batch(
    batch: pd.DataFrame, text_col: str = "text"
) -> pd.DataFrame:
    """Shannon entropy (bits) of each doc's character distribution —
    the classic gibberish/boilerplate detector (low entropy = repeated
    filler, high = random noise).  Fully vectorized: one utf-32 decode
    of the concatenated batch text, one np.unique over
    (doc, codepoint) composite keys, one scatter-add — no per-row
    Python."""
    t = batch[text_col].fillna("")
    lens = t.str.len().to_numpy(dtype=np.int64)
    ent = np.zeros(len(batch))
    if lens.sum():
        cps = np.frombuffer(
            "".join(t.tolist()).encode("utf-32-le"), dtype=np.uint32
        ).astype(np.int64)
        doc_of = np.repeat(np.arange(len(batch), dtype=np.int64), lens)
        key = doc_of * 0x110000 + cps
        uniq, counts = np.unique(key, return_counts=True)
        ud = uniq // 0x110000
        p = counts / lens[ud]
        np.add.at(ent, ud, -p * np.log2(p))
    out = batch[[c for c in batch.columns if c != text_col]].copy()
    out["char_entropy"] = np.round(ent, 6)
    return out


def langid_batch(batch: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Stopword-vote language ID over {en, es, pt}; 'und' when no
    stopword of any language appears. Arrow-exploded words (one
    split_pattern_regex pass) + per-language is_in/bincount votes."""
    flat, row_idx = _arrow_alpha_words(_arrow_text(batch, text_col))
    return _langid_finish(batch, flat, row_idx)


def _langid_finish(batch: pd.DataFrame, flat, row_idx: np.ndarray) -> pd.DataFrame:
    langs = list(STOPWORDS)
    votes = np.zeros((len(batch), len(langs)), dtype=np.int64)
    for j, lang in enumerate(langs):
        votes[:, j] = _stop_counts(flat, row_idx, STOPWORDS[lang], len(batch))
    best = votes.argmax(axis=1)
    out = batch.copy()
    out["lang_pred"] = np.where(
        votes.max(axis=1) > 0, np.asarray(langs, dtype=object)[best], "und"
    )
    out["lang_votes"] = votes.max(axis=1)
    return out


def quality_langid_batch(
    batch: pd.DataFrame, text_col: str = "text"
) -> pd.DataFrame:
    """Fused quality_batch -> langid_batch: identical output to the
    chained calls, but the text converts, lowercases and word-explodes
    ONCE (the two kernels share the [a-z]+ tokenization — chaining
    them pays it twice). The prepare pipeline's enrich stage is this
    fusion's hot caller."""
    import pyarrow.compute as pc

    t = _arrow_text(batch, text_col)
    n_chars = pc.utf8_length(t).to_numpy().astype("int64")
    n_words = pc.count_substring_regex(t, r"\S+").to_numpy().astype("int64")
    n_punct = (
        pc.count_substring_regex(t, r"[^\w\s]").to_numpy().astype("int64")
    )
    flat, row_idx = _arrow_alpha_words(t)
    n_stop = _stop_counts(flat, row_idx, ALL_STOPWORDS, len(batch))
    out = _quality_finish(batch, n_chars, n_words, n_punct, n_stop)
    return _langid_finish(out, flat, row_idx)


def explode_words(texts: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """(flat_words, words_per_row): lowercased [a-z0-9]+ tokens of each
    text, flattened, plus the per-row token count (for np.repeat doc
    alignment). Shared by word_doc_freq and ops/lmscore so vocab and
    scoring tokenize identically."""
    words = texts.fillna("").str.lower().str.findall(r"[a-z0-9]+")
    counts = words.str.len().to_numpy(dtype=np.int64)
    flat = words.explode().dropna().to_numpy()
    return flat, counts


def explode_words_arrow(col) -> tuple["object", np.ndarray]:
    """Arrow-native explode_words: (flat_words, parent_row_indices).

    Same tokens as :func:`explode_words` — [a-z0-9]+ runs of the
    lowercased text (split on the complement, empties dropped; verified
    token-identical against .str.findall) — but computed entirely with
    pyarrow kernels (utf8_lower + split_pattern_regex + list_flatten),
    so a 100k-doc batch tokenizes ~3x faster and the input batch stays
    zero-copy Arrow.  Returns the flat word column as a pyarrow
    StringArray (hashable via hash_strings(flat.to_pandas()) or usable
    with .take()) plus the int64 row index of each word's source doc.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    t = pc.utf8_lower(pc.fill_null(col, ""))
    lists = pc.split_pattern_regex(t, "[^a-z0-9]+")
    flat = pc.list_flatten(lists)
    parent = pc.list_parent_indices(lists)
    mask = pc.not_equal(flat, "")
    flat = flat.filter(mask)
    parent = parent.filter(mask).to_numpy().astype(np.int64, copy=False)
    return flat, parent


def hash_words_arrow(flat) -> np.ndarray:
    """uint64 hashes of an Arrow string array, identical to
    hash_strings over the same strings (object-dtype round trip is the
    fastest path for pd.util.hash_pandas_object)."""
    if len(flat) == 0:
        return np.empty(0, dtype=np.uint64)
    return hashing.hash_strings(
        pd.Series(flat.to_numpy(zero_copy_only=False))
    )


def fingerprint_batch(batch: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Rolling-hash document fingerprint over normalized words: an
    order-sensitive uint64 (same word sequence => same fingerprint,
    whitespace/case-insensitive)."""
    wh, off = hashing.tokenize_words(batch[text_col])
    n = len(batch)
    fp = np.zeros(n, dtype=np.uint64)
    if len(wh):
        # prefix-combine per doc: fold word hashes left-to-right
        doc_of = np.repeat(np.arange(n), np.diff(off))
        acc = np.zeros(n, dtype=np.uint64)
        # loop over max doc length, vectorized across docs (bounded by
        # longest doc, not total words)
        counts = np.diff(off)
        max_len = int(counts.max()) if len(counts) else 0
        for i in range(max_len):
            sel = counts > i
            idx = off[:-1][sel] + i
            acc[sel] = hashing.combine(acc[sel], wh[idx])
        fp = acc
    out = batch.copy()
    out["fingerprint"] = fp
    return out


def word_doc_freq(
    ds, text_col: str = "text", k: int = 20, id_col: str = "doc_id"
):
    """Top-k words by DOCUMENT frequency (the DF side of TF-IDF vocab
    building): per-batch explode + per-doc dedup (only distinct
    (doc, word) pairs leave the worker), one sorted-run counting pass
    over the word key (ops/dedup.sorted_group_counts — high-cardinality
    safe), then a partial-top-k merge (ops/topk.topk). Ties break to
    the lexicographically smaller word. Words are [a-z0-9]+ runs of the
    lowercased text (the same tokens ops/hashing.tokenize_words
    hashes)."""
    from . import dedup as _dedup
    from . import topk as _topk

    def pairs(b: "pa.Table") -> "pa.Table":
        import pyarrow as pa

        flat, parent = explode_words_arrow(b[text_col])
        if len(flat) == 0:
            return pa.table({"word": pa.array([], type=pa.string())})
        # per-doc distinct words via one (doc, hash) lexsort — only run
        # starts (distinct pairs) leave the worker
        h = hash_words_arrow(flat)
        order = np.lexsort((h, parent))
        d_, h_ = parent[order], h[order]
        first = np.ones(len(h_), dtype=bool)
        first[1:] = (h_[1:] != h_[:-1]) | (d_[1:] != d_[:-1])
        return pa.table(
            {"word": flat.take(pa.array(order[np.flatnonzero(first)]))}
        )

    word_rows = ds.map_batches(pairs, batch_format="pyarrow")
    counts = _dedup.sorted_group_counts(word_rows, ["word"], alias="n_docs")

    def cast(b):
        import pyarrow as pa
        import pyarrow.compute as pc

        i = b.schema.get_field_index("n_docs")
        return b.set_column(i, "n_docs", pc.cast(b["n_docs"], pa.int64()))

    return _topk.topk(
        counts.map_batches(cast, batch_format="pyarrow"),
        sort_cols=["n_docs", "word"],
        k=k,
        descending=[True, False],
    )


def repetition_batch(batch: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Repetition-based quality signals per document (the published
    duplicate-n-gram family of heuristics for filtering boilerplate /
    degenerate text from training corpora):

    * dup_word_frac    1 - distinct_words / total_words
    * top_bigram_frac  occurrences of the most frequent bigram / total
                       bigram occurrences
    * dup_bigram_frac  fraction of bigram occurrences whose bigram
                       appears more than once

    All-zero for docs with no words (fracs defined as 0 when the
    denominator is 0; bigram fracs 0 for one-word docs). Pure stateless
    batch kernel: word hashes via ops/hashing (deterministic), per-doc
    run counting via one lexsort — no Python per-row loop.
    """
    wh, off = hashing.tokenize_words(batch[text_col])
    n = len(batch)
    counts = np.diff(off)
    doc_of = np.repeat(np.arange(n), counts)

    def _per_doc_run_stats(keys: np.ndarray, docs: np.ndarray, n_docs: int):
        """(distinct, max_run, dup_occurrences) per doc for (doc, key)
        runs of a flat key array."""
        distinct = np.zeros(n_docs, dtype=np.int64)
        max_run = np.zeros(n_docs, dtype=np.int64)
        dup_occ = np.zeros(n_docs, dtype=np.int64)
        if len(keys) == 0:
            return distinct, max_run, dup_occ
        order = np.lexsort((keys, docs))
        k, d = keys[order], docs[order]
        new_run = np.ones(len(k), dtype=bool)
        new_run[1:] = (k[1:] != k[:-1]) | (d[1:] != d[:-1])
        starts = np.flatnonzero(new_run)
        run_len = np.diff(np.append(starts, len(k)))
        run_doc = d[starts]
        distinct[:] = np.bincount(run_doc, minlength=n_docs)
        np.maximum.at(max_run, run_doc, run_len)
        np.add.at(dup_occ, run_doc, np.where(run_len > 1, run_len, 0))
        return distinct, max_run, dup_occ

    w_distinct, _, _ = _per_doc_run_stats(wh, doc_of, n)

    # bigrams: combine consecutive word hashes within each doc
    big_ok = np.zeros(len(wh), dtype=bool)
    if len(wh):
        idx = np.arange(len(wh))
        nxt_in_doc = (idx + 1 < len(wh)) & (doc_of[np.minimum(idx + 1, len(wh) - 1)] == doc_of)
        big_ok = nxt_in_doc
    bg = hashing.combine(wh[big_ok], np.roll(wh, -1)[big_ok]) if len(wh) else wh
    bg_doc = doc_of[big_ok] if len(wh) else doc_of
    _, bg_max, bg_dup = _per_doc_run_stats(bg, bg_doc, n)
    bg_tot = np.bincount(bg_doc, minlength=n) if len(wh) else np.zeros(n, dtype=np.int64)

    out = batch.copy()
    wc = counts.astype(np.float64)
    bc = bg_tot.astype(np.float64)
    out["dup_word_frac"] = np.round(
        np.where(counts > 0, 1.0 - w_distinct / np.maximum(wc, 1), 0.0), 6
    )
    out["top_bigram_frac"] = np.round(
        np.where(bg_tot > 0, bg_max / np.maximum(bc, 1), 0.0), 6
    )
    out["dup_bigram_frac"] = np.round(
        np.where(bg_tot > 0, bg_dup / np.maximum(bc, 1), 0.0), 6
    )
    return out


def tfidf_top_terms(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    broadcast_limit: int = 5_000_000,
) -> "ray.data.Dataset":
    """Top-k TF-IDF terms per document: (id, word, tfidf) with
    tfidf = tf * ln(N_docs / df), ranked by (tfidf desc, word asc),
    rounded to 6 dp BEFORE ranking so the ordering is replayable in
    SQL.

    Two passes, both keyed on uint64 WORD HASHES so sorts/shuffles move
    8-byte ints, not strings (word strings are recovered in-batch and
    only ride along on the tiny final rows; a cross-word hash collision
    needs ~2^64 odds — the minhash-family contract). Pass 1 builds the
    document-frequency table with the sorted-run machinery (only
    distinct (doc, hash) pairs leave each worker). Pass 2 is adaptive
    like pipelines/prepare: a vocab that fits driver memory broadcasts
    as a plain dict and scoring+top-k fuses into one stateless map over
    the corpus (docs are whole within a batch, so per-doc top-k needs
    no shuffle); a larger vocab falls back to a hash join of (doc,
    hash, word, tf) rows against the DF table plus
    ops/topk.grouped_topk.
    """
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data  # noqa: F401

    from . import dedup as _dedup
    from . import topk as _topk

    n_docs = ds.count()

    def _doc_term_runs(b: "pa.Table"):
        """(doc_idx, word_hash) runs of a batch: per distinct (doc,
        term) one entry — (docs, hashes, words, tf) — via Arrow
        tokenization + one lexsort, no string groupby and no pandas
        batch conversion (words stay an Arrow StringArray)."""
        flat, parent = explode_words_arrow(b[text_col])
        if len(flat) == 0:
            e64 = np.empty(0, dtype=np.uint64)
            ei = np.empty(0, dtype=np.int64)
            return ei, e64, flat, ei
        h = hash_words_arrow(flat)
        order = np.lexsort((h, parent))
        d_, h_ = parent[order], h[order]
        first = np.ones(len(h_), dtype=bool)
        first[1:] = (h_[1:] != h_[:-1]) | (d_[1:] != d_[:-1])
        starts = np.flatnonzero(first)
        tf = np.diff(np.append(starts, len(h_))).astype(np.int64)
        return d_[starts], h_[starts], flat.take(pa.array(order[starts])), tf

    def df_pairs(b: "pa.Table") -> "pa.Table":
        _, hashes, _, _ = _doc_term_runs(b)
        return pa.table({"h": pa.array(hashes, type=pa.uint64())})

    def _cast_df(b: "pa.Table") -> "pa.Table":
        i = b.schema.get_field_index("df")
        return b.set_column(i, "df", pc.cast(b["df"], pa.int64()))

    df_rows = _dedup.sorted_group_counts(
        ds.map_batches(df_pairs, batch_format="pyarrow"), ["h"], alias="df"
    ).map_batches(_cast_df, batch_format="pyarrow").materialize()

    if df_rows.count() <= broadcast_limit:
        dfp = df_rows.to_pandas()
        # empty corpus: to_pandas of an all-empty Dataset drops the
        # schema (NOTES landmine) — the map is simply empty
        df_map = (
            {}
            if len(dfp) == 0
            else dict(
                zip(dfp["h"].to_numpy(dtype=np.uint64).tolist(), dfp["df"].tolist())
            )
        )
        ref = ray.put(df_map)

        def score_topk(b: "pa.Table") -> "pa.Table":
            docs, hashes, words, tf = _doc_term_runs(b)
            if len(hashes) == 0:
                return pa.table(
                    {
                        id_col: b[id_col].slice(0, 0),
                        "word": pa.array([], type=pa.string()),
                        "tfidf": pa.array([], type=pa.float64()),
                    }
                )
            dfm = ray.get(ref)
            dfv = np.asarray([dfm[int(x)] for x in hashes], dtype=np.float64)
            out = pa.table(
                {
                    id_col: b[id_col].take(pa.array(docs)),
                    "word": words,
                    "tfidf": pa.array(
                        np.round(tf * np.log(np.float64(n_docs) / dfv), 6),
                        type=pa.float64(),
                    ),
                }
            )
            order = pc.sort_indices(
                out,
                sort_keys=[
                    (id_col, "ascending"),
                    ("tfidf", "descending"),
                    ("word", "ascending"),
                ],
            )
            out = out.take(order)
            # first k per id: vectorized rank-within-run over the
            # sorted id column (same as the pandas cumcount < k)
            n = len(out)
            ids = out[id_col].combine_chunks()
            first = np.ones(n, dtype=bool)
            if n > 1:
                first[1:] = ~pc.equal(
                    ids.slice(1), ids.slice(0, n - 1)
                ).to_numpy(zero_copy_only=False)
            idx = np.arange(n, dtype=np.int64)
            run_start = np.maximum.accumulate(np.where(first, idx, 0))
            return out.filter(pa.array(idx - run_start < k))

        return ds.map_batches(score_topk, batch_format="pyarrow")

    # join path: (doc, hash, word, tf) rows against the DF table, then
    # the distributed ROW_NUMBER shape
    from . import default_join_partitions

    num_partitions = default_join_partitions()

    def tf_frame(b: "pa.Table") -> "pa.Table":
        docs, hashes, words, tf = _doc_term_runs(b)
        return pa.table(
            {
                id_col: b[id_col].take(pa.array(docs))
                if len(hashes)
                else b[id_col].slice(0, 0),
                "h": pa.array(hashes, type=pa.uint64()),
                "word": words,
                "tf": pa.array(tf, type=pa.int64()),
            }
        )

    tf_rows = (
        ds.map_batches(tf_frame, batch_format="pyarrow")
        .repartition(num_partitions)  # drop schema-less empties pre-join
    )
    joined = tf_rows.join(
        df_rows.map_batches(
            lambda b: b.rename_columns(
                ["dh" if c == "h" else c for c in b.column_names]
            ),
            batch_format="pyarrow",
        ).repartition(num_partitions),
        "inner",
        num_partitions=num_partitions,
        on=("h",),
        right_on=("dh",),
    )

    def score(b: "pa.Table") -> "pa.Table":
        tfidf = np.round(
            b["tf"].to_numpy().astype(np.float64)
            * np.log(np.float64(n_docs) / b["df"].to_numpy()),
            6,
        )
        return pa.table(
            {
                id_col: b[id_col],
                "word": b["word"],
                "tfidf": pa.array(tfidf, type=pa.float64()),
            }
        )

    scored = joined.map_batches(score, batch_format="pyarrow")
    return _topk.grouped_topk(
        scored, [id_col], ["tfidf", "word"], k=k, descending=[True, False]
    )


def domain_kl_divergence(
    ds: "ray.data.Dataset",
    group_col: str = "source",
    text_col: str = "text",
    vocab_k: int = 1000,
) -> pd.DataFrame:
    """(group, kl): KL(p_group || p_corpus) over the top-K corpus
    vocabulary — how far each domain's unigram distribution sits from
    the corpus mix, the domain-reweighting diagnostic a pretraining
    mixer reads before setting sampling rates.

        KL = sum over vocab words w with c_g(w) > 0 of
             (c_g(w)/N_g) * ln( (c_g(w)/N_g) / (c(w)/N) )

    (p_group normalized over ALL the group's tokens; the sum restricted
    to corpus-vocab words the group actually uses — deterministic and
    SQL-replayable.)

    Scale shape: ONE sorted-run shuffle over (word, group) count
    projections (high-cardinality safe, pre-reduced per batch);
    corpus-level word totals fold from the (word, group) table by a
    second sorted-run sum keyed on word; group token totals are a
    bounded groupby; the vocab cut is a partial top-k. Output is
    |groups| rows."""
    from . import topk as _topk
    from .dedup import sorted_group_counts
    from .groupagg import sorted_group_sum
    import ray as _ray

    # (word, group) counts — pre-reduced per batch, then sorted runs
    def wg_rows(b: pd.DataFrame) -> pd.DataFrame:
        flat, counts = explode_words(b[text_col])
        grp = np.repeat(b[group_col].to_numpy(), counts)
        out = pd.DataFrame({"word": flat, "grp": grp})
        g = out.groupby(["word", "grp"], as_index=False).size()
        g["n"] = g["size"].astype("float64")
        return g[["word", "grp", "n"]]

    wg = sorted_group_sum(
        ds.map_batches(wg_rows, batch_format="pandas"), ["word", "grp"], "n",
        alias="c_wg",
    ).materialize()

    # corpus word totals from the (word, group) table
    wtot = sorted_group_sum(wg, ["word"], "c_wg", alias="c_w")

    def cast(b: pd.DataFrame) -> pd.DataFrame:
        b["c_w"] = b["c_w"].astype("int64")
        return b

    vocab = _topk.topk(
        wtot.map_batches(cast, batch_format="pandas"),
        sort_cols=["c_w", "word"],
        k=vocab_k,
        descending=[True, False],
    ).to_pandas()
    n_total = float(
        wg.map_batches(
            lambda b: pd.DataFrame({"s": [b["c_wg"].sum()]}),
            batch_format="pandas",
        ).to_pandas()["s"].sum()
    )
    if n_total == 0:
        return pd.DataFrame({group_col: [], "kl": []})
    vocab_ref = _ray.put(
        {w: float(c) for w, c in zip(vocab["word"], vocab["c_w"])}
    )

    # group token totals (bounded cardinality)
    ng = (
        wg.map_batches(
            lambda b: b.groupby("grp", as_index=False)["c_wg"].sum(),
            batch_format="pandas",
        )
        .to_pandas()
        .groupby("grp")["c_wg"].sum()
    )
    ng_ref = _ray.put(ng.to_dict())

    # per-(word, group) KL terms -> bounded per-group sums
    def terms(b: pd.DataFrame) -> pd.DataFrame:
        voc = _ray.get(vocab_ref)
        ngs = _ray.get(ng_ref)
        cw = b["word"].map(voc).to_numpy(dtype=np.float64)
        in_vocab = ~np.isnan(cw)
        b = b[in_vocab]
        if len(b) == 0:
            return pd.DataFrame({"grp": [], "t": []})
        cw = cw[in_vocab]
        n_g = b["grp"].map(ngs).to_numpy(dtype=np.float64)
        p_g = b["c_wg"].to_numpy(dtype=np.float64) / n_g
        p_c = cw / n_total
        t = p_g * np.log(p_g / p_c)
        return (
            pd.DataFrame({"grp": b["grp"].to_numpy(), "t": t})
            .groupby("grp", as_index=False)["t"].sum()
        )

    out = (
        wg.map_batches(terms, batch_format="pandas")
        .to_pandas()
        .groupby("grp", as_index=False)["t"].sum()
    )
    out = out.rename(columns={"grp": group_col, "t": "kl"})
    out["kl"] = out["kl"].round(6)
    return out.sort_values(group_col).reset_index(drop=True)


def mutual_information_terms(
    ds: "ray.data.Dataset",
    label_col: str = "lang",
    text_col: str = "text",
    vocab_k: int = 1000,
    top_m: int = 50,
) -> pd.DataFrame:
    """(word, mi): the top-M vocabulary words by mutual information
    with a document label — MI-based feature selection, the classic
    pick-the-discriminative-terms pass before training a lightweight
    label classifier (language ID, domain router).

        MI(w) = sum over labels l with c(w,l) > 0 of
                p(w,l) * ln( p(w,l) / (p(w) * p(l)) )

    with all probabilities over the corpus token count. Restricted to
    the top-K corpus vocabulary; winners ordered by (mi rounded to
    6 dp DESC, word) so the cut is deterministic and SQL-replayable.

    Scale shape: the same ONE sorted-run (word, label) shuffle as
    domain_kl_divergence; after the vocab cut at most K x |labels|
    term rows fold on the driver."""
    from . import topk as _topk
    from .groupagg import sorted_group_sum
    import ray as _ray

    def wl_rows(b: pd.DataFrame) -> pd.DataFrame:
        flat, counts = explode_words(b[text_col])
        lab = np.repeat(b[label_col].to_numpy(), counts)
        out = pd.DataFrame({"word": flat, "lab": lab})
        g = out.groupby(["word", "lab"], as_index=False).size()
        g["n"] = g["size"].astype("float64")
        return g[["word", "lab", "n"]]

    wl = sorted_group_sum(
        ds.map_batches(wl_rows, batch_format="pandas"), ["word", "lab"], "n",
        alias="c_wl",
    ).materialize()

    wtot = sorted_group_sum(wl, ["word"], "c_wl", alias="c_w")

    def cast(b: pd.DataFrame) -> pd.DataFrame:
        b["c_w"] = b["c_w"].astype("int64")
        return b

    vocab = _topk.topk(
        wtot.map_batches(cast, batch_format="pandas"),
        sort_cols=["c_w", "word"],
        k=vocab_k,
        descending=[True, False],
    ).to_pandas()
    n_total = float(
        wl.map_batches(
            lambda b: pd.DataFrame({"s": [b["c_wl"].sum()]}),
            batch_format="pandas",
        ).to_pandas()["s"].sum()
    )
    if n_total == 0:
        return pd.DataFrame({"word": [], "mi": []})
    lt = (
        wl.map_batches(
            lambda b: b.groupby("lab", as_index=False)["c_wl"].sum(),
            batch_format="pandas",
        )
        .to_pandas()
        .groupby("lab")["c_wl"].sum()
        .to_dict()
    )
    vocab_ref = _ray.put(
        {w: float(c) for w, c in zip(vocab["word"], vocab["c_w"])}
    )
    lt_ref = _ray.put(lt)

    def terms(b: pd.DataFrame) -> pd.DataFrame:
        voc = _ray.get(vocab_ref)
        lts = _ray.get(lt_ref)
        cw = b["word"].map(voc).to_numpy(dtype=np.float64)
        keep = ~np.isnan(cw)
        b = b[keep]
        if len(b) == 0:
            return pd.DataFrame({"word": [], "t": []})
        cw = cw[keep]
        cl = b["lab"].map(lts).to_numpy(dtype=np.float64)
        p_wl = b["c_wl"].to_numpy(dtype=np.float64) / n_total
        t = p_wl * np.log(p_wl / ((cw / n_total) * (cl / n_total)))
        return (
            pd.DataFrame({"word": b["word"].to_numpy(), "t": t})
            .groupby("word", as_index=False)["t"].sum()
        )

    out = (
        wl.map_batches(terms, batch_format="pandas")
        .to_pandas()
        .groupby("word", as_index=False)["t"].sum()
        .rename(columns={"t": "mi"})
    )
    out["mi"] = out["mi"].round(6)
    return (
        out.sort_values(["mi", "word"], ascending=[False, True])
        .head(top_m)
        .reset_index(drop=True)
    )


def compression_ratio_batch(
    batch: pd.DataFrame, text_col: str = "text", level: int = 6
) -> pd.DataFrame:
    """zlib compressed-size / raw-size per doc — the cheap
    redundancy/quality heuristic (repetitive boilerplate compresses
    hard, natural prose sits mid-range, noise stays near 1.0). The
    per-doc zlib call runs in C; empty docs report ratio 0."""
    import zlib

    t = batch[text_col].fillna("")
    raw = t.str.len().to_numpy(dtype=np.int64)
    comp = np.fromiter(
        (len(zlib.compress(s.encode("utf-8"), level)) for s in t),
        dtype=np.int64,
        count=len(t),
    )
    out = batch[[c for c in batch.columns if c != text_col]].copy()
    out["compression_ratio"] = np.round(
        np.where(raw > 0, comp / np.maximum(raw, 1), 0.0), 6
    )
    return out
