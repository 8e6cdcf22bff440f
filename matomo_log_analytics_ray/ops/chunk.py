"""Document chunking: split long docs into fixed-size overlapping
windows (the tokenize-and-chunk step of a pretraining pipeline —
complementary to ops/pack, which CONCATENATES small docs; chunking
SPLITS large ones so no training sequence exceeds the context budget
while overlap preserves cross-boundary context).

Pure fan-out: one ``map_batches`` pass, no shuffle, no state. Each doc
of length L emits ``1 if L <= size else ceil((L - size) / stride) + 1``
chunks covering ``[k*stride, k*stride + size)`` — the standard
sliding-window chunking (stride = size - overlap). Chunk counts and
offsets are computed vectorized (numpy repeat/cumsum); only the final
ragged substring extraction is a per-chunk slice (strings are ragged —
there is no numpy kernel for per-row variable slicing).

Beyond-reference op (SURVEY.md "beyond-reference"); the reference
control plane never splits payloads.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data


def chunk_batch(
    b: pd.DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 120,
    stride: int = 80,
) -> pd.DataFrame:
    texts = b[text_col].astype(object).to_numpy()
    lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=len(texts))
    n_chunks = np.where(
        lens <= size, 1, (np.maximum(lens - size, 0) + stride - 1) // stride + 1
    ).astype(np.int64)
    doc_of = np.repeat(np.arange(len(b)), n_chunks)
    # chunk_idx = global position minus the doc's run start
    starts_of_run = np.concatenate([[0], np.cumsum(n_chunks)[:-1]])
    chunk_idx = np.arange(len(doc_of)) - starts_of_run[doc_of]
    starts = chunk_idx * stride
    chunks = [texts[d][s : s + size] for d, s in zip(doc_of, starts)]
    return pd.DataFrame(
        {
            id_col: b[id_col].to_numpy()[doc_of],
            "chunk_idx": chunk_idx,
            "chunk": pd.Series(chunks, dtype=object),
            "chunk_chars": pd.Series([len(c) for c in chunks], dtype="int64"),
        }
    )


def chunk_documents(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 120,
    overlap: int = 40,
) -> "ray.data.Dataset":
    """(id, chunk_idx, chunk, chunk_chars): sliding-window chunks of at
    most ``size`` chars with ``overlap`` chars shared between
    consecutive chunks. 0 < overlap < size."""
    if not 0 <= overlap < size:
        raise ValueError("need 0 <= overlap < size")
    stride = size - overlap
    return ds.map_batches(
        lambda b: chunk_batch(b, id_col, text_col, size, stride),
        batch_format="pandas",
    )
