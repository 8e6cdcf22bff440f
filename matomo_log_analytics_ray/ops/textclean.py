"""Text normalization + PII-style redaction — the cleanup stage a
training-data pipeline runs before tokenization/dedup.

Stateless vectorized map_batches kernels (compiled-regex chains over
pandas string ops). The default redaction chain masks URLs, e-mail
addresses and digit runs IN THAT ORDER (URLs may embed both of the
others); all patterns are chosen to behave identically under Python
re and RE2/DuckDB on ASCII input so the transform is SQL-replayable
(gate: ``text_clean`` in __ray_entry__).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

# (name, pattern, replacement) applied in order; ORDER MATTERS — a URL
# can contain an e-mail-shaped string and digits.
DEFAULT_REDACTIONS: list[tuple[str, str, str]] = [
    ("url", r"https?://[^\s]+", "<url>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<email>"),
    ("num", r"[0-9]+", "<num>"),
]

_WS = re.compile(r"[ \t\r\n\f]+")


def clean_batch(
    batch: pd.DataFrame,
    text_col: str = "text",
    out_col: str = "clean_text",
    redactions: list[tuple[str, str, str]] | None = None,
    lowercase: bool = True,
    count_col: str = "n_redactions",
) -> pd.DataFrame:
    """Normalize + redact one batch: optional lowercase, the redaction
    chain, whitespace collapse to single spaces, trim. Adds ``out_col``
    and ``count_col`` (total substitutions across the chain, the
    monitoring counter a redaction stage must report)."""
    if redactions is None:
        redactions = DEFAULT_REDACTIONS
    t = batch[text_col].fillna("")
    if lowercase:
        t = t.str.lower()
    n_red = np.zeros(len(batch), dtype=np.int64)
    for _, pat, repl in redactions:
        n_red += t.str.count(pat).to_numpy(dtype=np.int64)
        t = t.str.replace(pat, repl, regex=True)
    t = t.str.replace(_WS, " ", regex=True).str.strip()
    out = batch.copy()
    out[out_col] = t
    out[count_col] = n_red
    return out


def truncate_batch(
    batch: pd.DataFrame,
    text_col: str = "text",
    max_words: int = 32,
    out_col: str = "truncated_text",
) -> pd.DataFrame:
    """Token-budget truncation: keep the first ``max_words``
    whitespace-separated words (whitespace-normalizing — words are
    rejoined with single spaces, matching the SQL replay). Adds
    ``out_col``, ``n_words_kept`` and ``was_truncated`` — the audit
    columns a truncation stage must report."""
    words = batch[text_col].fillna("").str.split()
    n = words.str.len().fillna(0).astype("int64")
    out = batch.copy()
    out[out_col] = words.str[:max_words].str.join(" ")
    out["n_words_kept"] = np.minimum(n, max_words)
    out["was_truncated"] = n > max_words
    return out
