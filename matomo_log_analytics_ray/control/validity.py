"""Validity predicate for discovered log files.

Vectorized analog of is_valid_log
(/root/reference/libs/lib_status.py:85-116). Invalid rows are KEPT and
marked with status INVALID — never dropped (auditability, SURVEY.md F2).

Rules (conjunctive; any hit -> invalid):
  scl:  'varnishncsa' in path            AND date > 2020-04-29
  scl:  server == 'hiperion-apache'      AND date > 2020-04-29
  server == 'preprints':  'error' in path, OR 'preprints' not in
        basename, OR basename does not end with '.log.gz'
  ven:  server in INVALID_SERVERS
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from . import routing, rules


def is_valid(
    collection: str | pd.Series,
    paths: pd.Series,
    servers: pd.Series,
    dates: pd.Series,
) -> pd.Series:
    """Boolean Series: True where the file may be loaded.

    ``dates`` are '%Y-%m-%d' strings (already validated by
    dates.extract_date); ``collection`` may be a scalar or a Series.
    """
    paths = paths.astype(object).fillna("")
    servers = servers.astype(object).fillna("")
    if not isinstance(collection, pd.Series):
        collection = pd.Series(collection, index=paths.index, dtype=object)

    # normalized '%Y-%m-%d' strings compare lexicographically ==
    # chronologically, and (unlike pandas timestamps) have no year-2262
    # range ceiling
    d = pd.Series(dates).astype(object).fillna("")
    names = routing.basename(paths)

    is_scl = (collection == "scl").to_numpy()
    after_cutoff = ((d > rules.SCL_ANON_IP_CUTOFF) & (d != "")).to_numpy()
    invalid = np.zeros(len(paths), dtype=bool)
    invalid |= is_scl & paths.str.contains("varnishncsa", regex=False).to_numpy() & after_cutoff
    invalid |= is_scl & (servers == "hiperion-apache").to_numpy() & after_cutoff

    is_pre_server = (servers == "preprints").to_numpy()
    invalid |= is_pre_server & paths.str.contains("error", regex=False).to_numpy()
    invalid |= is_pre_server & ~names.str.contains("preprints", regex=False).to_numpy()
    invalid |= is_pre_server & ~names.str.endswith(".log.gz").to_numpy()

    invalid |= (collection == "ven").to_numpy() & servers.isin(rules.INVALID_SERVERS).to_numpy()

    return pd.Series(~invalid, index=paths.index)


def is_valid_one(collection: str, path: str, server: str, date: str) -> bool:
    return bool(
        is_valid(collection, pd.Series([path]), pd.Series([server]), pd.Series([date])).iloc[0]
    )
