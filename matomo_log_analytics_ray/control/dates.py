"""Multi-format date extraction from paths/strings.

Vectorized analog of extract_log_date
(/root/reference/libs/lib_file_name.py:139-163): a first-match-wins
cascade of (regex, layout) pairs. For each format the FIRST regex
occurrence in the string is taken and validated with a strict calendar
check; a regex hit that fails validation (e.g. 2020-13-45) falls
through to the NEXT format, not the next occurrence. Output is the
normalized '%Y-%m-%d' string, or '' when no format yields a valid date.

Validation is an explicit vectorized calendar check (month 1-12, day
within month, Gregorian leap years) rather than pandas datetime —
strptime's year domain is 1..9999 while pandas timestamps stop at
2262, and log paths do contain garbage digit runs outside that range.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from . import rules

# Ordered cascade: (search regex, (year, month, day) slice offsets).
DATE_FORMATS = [
    (rules.RE_DATE_HYPHEN, ((0, 4), (5, 7), (8, 10))),
    (rules.RE_DATE_COMPACT, ((0, 4), (4, 6), (6, 8))),
]

_DAYS_IN_MONTH = np.array([0, 31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31])


def _valid_ymd(y: np.ndarray, m: np.ndarray, d: np.ndarray) -> np.ndarray:
    ok = (y >= 1) & (m >= 1) & (m <= 12) & (d >= 1)
    dim = _DAYS_IN_MONTH[np.clip(m, 0, 12)]
    leap = ((y % 4 == 0) & (y % 100 != 0)) | (y % 400 == 0)
    dim = dim + ((m == 2) & leap)
    return ok & (d <= dim)


def extract_date(strings: pd.Series) -> pd.Series:
    """Return normalized '%Y-%m-%d' (or '') per input string."""
    strings = strings.astype(object).fillna("")
    out = pd.Series("", index=strings.index, dtype=object)
    unresolved = pd.Series(True, index=strings.index)
    for regex, ((ys, ye), (ms, me), (ds_, de)) in DATE_FORMATS:
        if not unresolved.any():
            break
        cand = strings[unresolved].str.extract(f"({regex})", expand=False)
        hit = cand.notna()
        if not hit.any():
            continue
        c = cand[hit]
        y = c.str[ys:ye].astype(np.int64).to_numpy()
        m = c.str[ms:me].astype(np.int64).to_numpy()
        d = c.str[ds_:de].astype(np.int64).to_numpy()
        ok = _valid_ymd(y, m, d)
        if ok.any():
            idx = c.index[ok]
            norm = (
                c.str[ys:ye] + "-" + c.str[ms:me] + "-" + c.str[ds_:de]
            )[ok]
            out.loc[idx] = norm
            unresolved.loc[idx] = False
    return out


def extract_date_one(s: str) -> str:
    return extract_date(pd.Series([s])).iloc[0]
