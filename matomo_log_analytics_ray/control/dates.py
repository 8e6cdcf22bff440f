"""Multi-format date extraction from paths/strings.

Vectorized analog of extract_log_date
(/root/reference/libs/lib_file_name.py:139-163): a first-match-wins
cascade of (regex, strptime-format) pairs. For each format the FIRST
regex occurrence in the string is taken and validated with a strict
calendar parse; a regex hit that fails validation (e.g. 2020-13-45)
falls through to the NEXT format, not the next occurrence. Output is
the normalized '%Y-%m-%d' string, or '' when no format yields a valid
date.
"""

from __future__ import annotations

import pandas as pd

from . import rules

# Ordered cascade: (search regex, strptime format).
DATE_FORMATS = [
    (rules.RE_DATE_HYPHEN, "%Y-%m-%d"),
    (rules.RE_DATE_COMPACT, "%Y%m%d"),
]


def extract_date(strings: pd.Series) -> pd.Series:
    """Return normalized '%Y-%m-%d' (or '') per input string."""
    strings = strings.astype(object).fillna("")
    out = pd.Series("", index=strings.index, dtype=object)
    unresolved = pd.Series(True, index=strings.index)
    for regex, fmt in DATE_FORMATS:
        if not unresolved.any():
            break
        cand = strings[unresolved].str.extract(f"({regex})", expand=False)
        parsed = pd.to_datetime(cand, format=fmt, errors="coerce")
        ok = parsed.notna()
        if ok.any():
            hit_idx = parsed.index[ok]
            out.loc[hit_idx] = parsed[ok].dt.strftime("%Y-%m-%d")
            unresolved.loc[hit_idx] = False
    return out


def extract_date_one(s: str) -> str:
    return extract_date(pd.Series([s])).iloc[0]
