"""Status lattices and the per-date completeness rollup.

Re-expresses the reference's two state machines as pure, vectorized,
idempotent kernels (safe under Ray task retries):

* file-status lattice, LOADED absorbing
  (/root/reference/libs/lib_status.py:14-19, transition guard
  /root/reference/libs/lib_database.py:101-117);
* date-status guarded upgrade — an existing status only changes while it
  is QUEUE or PARTIAL (/root/reference/libs/lib_database.py:128-146);
* compute_date_status — count-if LOADED vs a piecewise-by-(collection,
  date) expected count (/root/reference/libs/lib_status.py:56-82).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from . import rules

# Date-status lattice (/root/reference/libs/lib_status.py:7-12).
DATE_QUEUE, DATE_PARTIAL, DATE_LOADED = 0, 1, 2
DATE_PRETABLE, DATE_COMPUTED, DATE_COMPLETED = 3, 4, 5

# File-status lattice (/root/reference/libs/lib_status.py:14-19).
FILE_QUEUE, FILE_PARTIAL, FILE_LOADED = 0, 1, 2
FILE_LOADING, FILE_FAILED, FILE_INVALID = 9, -1, -9

# Sentinels (/root/reference/libs/lib_database.py:21-22).
CRITICAL_ERROR = -999
SUCCESSFUL_RECOVERY = 999


def merge_file_status(current: pd.Series, proposed: pd.Series) -> pd.Series:
    """File-status transition: adopt ``proposed`` unless the current
    status is LOADED (terminal/absorbing). Idempotent and safe to replay.
    """
    cur = np.asarray(current)
    prop = np.asarray(proposed)
    return pd.Series(np.where(cur == FILE_LOADED, cur, prop))


def merge_date_status(current: pd.Series, proposed: pd.Series) -> pd.Series:
    """Date-status guarded upgrade: only rows currently QUEUE or PARTIAL
    may change; PRETABLE and beyond are owned by downstream stages.
    """
    cur = np.asarray(current)
    prop = np.asarray(proposed)
    changeable = (cur == DATE_QUEUE) | (cur == DATE_PARTIAL)
    return pd.Series(np.where(changeable, prop, cur))


def expected_daily_count(collection: pd.Series, date: pd.Series) -> pd.Series:
    """Piecewise expected LOADED-file count per (collection, date).

    The piecewise table is data (rules.DAILY_EXPECTED_PIECEWISE); a date
    strictly after a row's cutoff takes that row's value, rows are
    evaluated in order, the None-cutoff row is the fallback.
    """
    collection = pd.Series(collection).astype(object)
    # ISO date strings compare lexicographically == chronologically and
    # have no pandas year-2262 ceiling; date objects stringify to ISO
    d = pd.Series(date).astype(str)
    d_ok = d.str.match(r"^\d{4}-\d{2}-\d{2}").fillna(False).to_numpy()
    out = collection.map(rules.DAILY_EXPECTED).to_numpy(dtype=object)

    for coll, rows in rules.DAILY_EXPECTED_PIECEWISE.items():
        mask = (collection == coll).to_numpy()
        if not mask.any():
            continue
        val = np.full(len(collection), rows[-1][1])
        # walk fallback -> most-recent cutoff so later (earlier in list,
        # larger cutoff) rows overwrite
        for cutoff, n in reversed(rows[:-1]):
            val = np.where((d > cutoff).to_numpy() & d_ok, n, val)
        out = np.where(mask, val, out)

    fallback = np.full(len(collection), rules.DAILY_EXPECTED_DEFAULT)
    out = np.where(pd.isna(out), fallback, out)
    return pd.Series(out.astype(np.int64), index=collection.index)


def compute_date_status(
    n_loaded: pd.Series, collection: pd.Series, date: pd.Series
) -> pd.Series:
    """LOADED when the count of LOADED files equals the expected count,
    PARTIAL when strictly between 0 and expected, else QUEUE (including
    the over-count case, as in the reference).
    """
    n = np.asarray(n_loaded)
    expected = expected_daily_count(collection, date).to_numpy()
    return pd.Series(
        np.where(
            n == expected,
            DATE_LOADED,
            np.where((n > 0) & (n < expected), DATE_PARTIAL, DATE_QUEUE),
        )
    )
