"""BM25 scoring of a document corpus against a small query set.

The retrieval-quality op of a data pipeline (mine docs relevant to a
topic, build eval sets, kNN-free lexical search). Okapi BM25 with the
Lucene idf flavor:

    score(q, d) = sum_{t in q}  idf(t) * tf * (k1 + 1)
                               / (tf + k1 * (1 - b + b * len_d / avglen))
    idf(t) = ln( (N - df_t + 0.5) / (df_t + 0.5) + 1 )

Scale shape: the query set is SMALL (driver-side), so only its term
set matters — pass 1 is one map_batches over the corpus emitting
(doc_id, term, tf) rows FOR QUERY TERMS ONLY plus per-batch
(n_docs, total_len, per-term df) partials; the tf table is bounded by
docs-containing-a-query-term x |terms|, not the corpus vocabulary.
Constants (N, avglen, df) fold on the driver from O(batches x terms)
partials; scoring is a second vectorized pass over the materialized tf
rows with the constants broadcast — no shuffle anywhere, no join
(per-doc length rides along with the tf rows).

Tokenization matches the text-op family: lowercased [a-z0-9]+ runs.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

import ray
import ray.data

_TOKEN_RE = r"[a-z0-9]+"


def bm25_scores(
    docs: "ray.data.Dataset",
    queries: dict[str, str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> "ray.data.Dataset":
    """(query_id, doc_id, score) for every doc containing at least one
    term of the query, scores rounded to 6 dp. ``queries`` maps
    query_id -> query text."""
    q_terms = {
        qid: sorted(set(re.findall(_TOKEN_RE, text.lower())))
        for qid, text in queries.items()
    }
    all_terms = np.array(sorted({t for ts in q_terms.values() for t in ts}), dtype=object)
    terms_ref = ray.put(all_terms)

    def tf_partials(bdf: pd.DataFrame) -> pd.DataFrame:
        terms = ray.get(terms_ref)
        words = bdf[text_col].fillna("").str.lower().str.findall(_TOKEN_RE)
        lens = words.str.len().to_numpy(dtype=np.int64)
        exploded = words.reset_index(drop=True).explode().dropna()
        row_idx = exploded.index.to_numpy(dtype=np.int64)
        w = exploded.to_numpy(dtype=object)
        pos = np.searchsorted(terms, w)
        pos_c = np.minimum(pos, len(terms) - 1)
        hit = terms[pos_c] == w
        # (row, term) tf counts via bincount on a combined index
        comb = row_idx[hit] * len(terms) + pos_c[hit]
        tf_flat = np.bincount(comb, minlength=len(bdf) * len(terms))
        tf = tf_flat.reshape(len(bdf), len(terms))
        nz_row, nz_term = np.nonzero(tf)
        out = pd.DataFrame(
            {
                id_col: bdf[id_col].to_numpy()[nz_row],
                "term": terms[nz_term],
                "tf": tf[nz_row, nz_term].astype(np.int64),
                "doc_len": lens[nz_row],
                "kind": "tf",
            }
        )
        # batch stats partial: one row per term (df partial) + one
        # totals row (placeholder term keeps the column dtype)
        stats = pd.DataFrame(
            {
                id_col: np.int64(-1),
                "term": terms,
                "tf": (tf > 0).sum(axis=0).astype(np.int64),  # df partial
                "doc_len": np.int64(0),
                "kind": "df",
            }
        )
        totals = pd.DataFrame(
            {
                id_col: [np.int64(-1)],
                "term": [""],
                "tf": [np.int64(len(bdf))],       # doc count
                "doc_len": [lens.sum()],          # total length
                "kind": ["tot"],
            }
        )
        return pd.concat([out, stats, totals], ignore_index=True)

    tagged = docs.map_batches(tf_partials, batch_format="pandas").materialize()
    parts = tagged.map_batches(
        lambda bdf: bdf[bdf["kind"] != "tf"], batch_format="pandas"
    ).to_pandas()  # O(batches x terms) rows
    tot = parts[parts["kind"] == "tot"]
    n_docs = int(tot["tf"].sum())
    avglen = float(tot["doc_len"].sum()) / max(1, n_docs)
    df_tbl = (
        parts[parts["kind"] == "df"].groupby("term")["tf"].sum().to_dict()
    )
    idf = {
        t: float(np.log((n_docs - df_tbl.get(t, 0) + 0.5) / (df_tbl.get(t, 0) + 0.5) + 1.0))
        for t in all_terms
    }
    consts_ref = ray.put((q_terms, idf, avglen))

    def score(bdf: pd.DataFrame) -> pd.DataFrame:
        qt, idf_m, avg = ray.get(consts_ref)
        bdf = bdf[bdf["kind"] == "tf"]
        frames = []
        for qid, ts in qt.items():
            sel = bdf[bdf["term"].isin(ts)]
            if len(sel) == 0:
                continue
            tf = sel["tf"].to_numpy(dtype=np.float64)
            dl = sel["doc_len"].to_numpy(dtype=np.float64)
            w = np.array([idf_m[t] for t in sel["term"]], dtype=np.float64)
            contrib = w * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avg))
            g = pd.DataFrame(
                {id_col: sel[id_col].to_numpy(), "contrib": contrib}
            ).groupby(id_col, as_index=False)["contrib"].sum()
            g.insert(0, "query_id", qid)
            frames.append(g)
        if not frames:
            return pd.DataFrame(
                {
                    "query_id": pd.Series([], dtype=object),
                    id_col: pd.Series([], dtype="int64"),
                    "score": pd.Series([], dtype="float64"),
                }
            )
        out = pd.concat(frames, ignore_index=True)
        # no rounding here: partial contributions of a block-split doc
        # must sum EXACTLY before the single final rounding
        out["score"] = out["contrib"]
        return out[["query_id", id_col, "score"]]

    # per-doc tf rows for one doc never split across blocks? They CAN
    # (dynamic block splits) — but contributions are per-(doc, term)
    # rows summed per doc, and a split block sums partially. Guard by
    # a final bounded re-sum keyed on (query_id, doc).
    scored = tagged.map_batches(score, batch_format="pandas")
    from . import groupagg

    out = groupagg.sorted_group_sum(
        scored, ["query_id", id_col], "score", alias="score"
    )
    return out.map_batches(
        lambda bdf: bdf.assign(score=bdf["score"].round(6)),
        batch_format="pandas",
    )
