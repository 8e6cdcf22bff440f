"""Routing-key (server name) extraction from log-file paths.

Vectorized re-expression of the reference's per-collection dispatch
(/root/reference/libs/lib_file_name.py:120-136) and its five rule
functions (:22-117). Each rule is a cascade of substring/regex masks
evaluated over a whole pandas Series of paths at once (numpy.select),
designed to run inside ``Dataset.map_batches``; the lookup tables are
tiny broadcast constants (SURVEY.md J1) — never an equality join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from . import rules


def basename(paths: pd.Series) -> pd.Series:
    """Component after the last '/'; whole string when no '/' present.

    Analog of extract_file_name (/root/reference/libs/lib_file_name.py:179-182).
    """
    return paths.str.rsplit("/", n=1).str[-1]


def _contains(s: pd.Series, pat: str) -> pd.Series:
    return s.str.contains(pat, regex=False)


def _rule_scl(paths: pd.Series, names: pd.Series) -> pd.Series:
    """Brasil classic site (/root/reference/libs/lib_file_name.py:22-31)."""
    hiperion = _contains(paths, "hiperion")
    conds = [
        _contains(paths, "node03"),
        hiperion & _contains(paths, "apache"),
        hiperion & _contains(paths, "varnish"),
    ]
    out = ["node03", "hiperion-apache", "hiperion-varnish"]
    return pd.Series(
        np.select(conds, out, default=rules.UNDEFINED), index=paths.index, dtype=object
    )


def _rule_nbr(paths: pd.Series, names: pd.Series) -> pd.Series:
    """Brasil new site (/root/reference/libs/lib_file_name.py:73-85)."""
    conds = [_contains(paths, pat) for pat, _ in rules.NBR_PATTERNS]
    out = [srv for _, srv in rules.NBR_PATTERNS]
    return pd.Series(
        np.select(conds, out, default=rules.UNDEFINED), index=paths.index, dtype=object
    )


def _rule_dat(paths: pd.Series, names: pd.Series) -> pd.Series:
    """Dataverse (/root/reference/libs/lib_file_name.py:34-39)."""
    in_dataverse = _contains(paths, "dataverse")
    dotted = _contains(names, "data.scielo")
    conds = [in_dataverse & dotted, in_dataverse]
    return pd.Series(
        np.select(conds, ["data2", "data1"], default=rules.UNDEFINED),
        index=paths.index,
        dtype=object,
    )


def _rule_pre(paths: pd.Series, names: pd.Series) -> pd.Series:
    """Preprints (/root/reference/libs/lib_file_name.py:42-45)."""
    mask = _contains(paths, "preprints") & _contains(names, "preprints")
    return pd.Series(
        np.where(mask, "preprints", rules.UNDEFINED), index=paths.index, dtype=object
    )


def _rule_ven(paths: pd.Series, names: pd.Series) -> pd.Series:
    """Venezuela decision tree (/root/reference/libs/lib_file_name.py:88-117).

    The nested elif structure is preserved exactly as an ordered condition
    cascade: earlier conditions shadow later ones (numpy.select picks the
    first true condition).
    """
    apache = _contains(paths, "apache")
    centos01 = _contains(paths, "centos-2gb-nyc3-01")
    centos02 = _contains(paths, "centos-2gb-nyc3-02")
    starts_date = names.str.contains(rules.RE_VEN_STARTS_WITH_DATE, regex=True)
    ends_date = names.str.contains(rules.RE_VEN_ENDS_WITH_DATE, regex=True)
    ends_date_compact = names.str.contains(
        rules.RE_VEN_ENDS_WITH_DATE_NO_HYPHEN, regex=True
    )
    conds = [
        apache & centos01 & starts_date,
        apache & centos01 & ends_date,
        apache & centos01 & ends_date_compact,
        apache & centos01,  # matched the branch but none of its regexes
        apache & centos02 & _contains(paths, "scielo-org-ve") & ends_date,
        apache & centos02 & _contains(paths, "scielo-org-ve"),
        apache & centos02 & _contains(paths, "varnish-aws"),
        apache & centos02,
        apache & _contains(names, "ve-scielo-org-access") & starts_date,
        apache & _contains(names, "ve-scielo-org-access"),
        apache & _contains(names, "ve-scielo-org") & starts_date,
        apache,
        _contains(paths, "logs-ha"),
    ]
    out = [
        "ven1", "ven3", "ven4", rules.UNDEFINED,
        "ven5", rules.UNDEFINED, "ven6", rules.UNDEFINED,
        "ven1", rules.UNDEFINED, "ven2", rules.UNDEFINED,
        "ven7",
    ]
    return pd.Series(
        np.select(conds, out, default=rules.UNDEFINED), index=paths.index, dtype=object
    )


def _rule_generic(paths: pd.Series, names: pd.Series, collection: str) -> pd.Series:
    """Generic-collection lookup ("ratchet",
    /root/reference/libs/lib_file_name.py:48-70).

    Substring containment against the two broadcast tables, post-filtered
    by ``collection in prefix`` (substring, as in the reference). Exactly
    one filename-table hit wins; zero filename hits fall through to the
    dir table; more than one hit anywhere is ambiguous -> UNDEFINED (the
    reference logs an error and returns None).
    """
    fn_entries = [
        (pat, prefix + number)
        for pat, (prefix, number) in rules.FILENAME_PATTERN_TO_SERVER.items()
        if collection in prefix
    ]
    dir_entries = [
        (pat, prefix + number)
        for pat, (prefix, number) in rules.DIR_PATTERN_TO_SERVER.items()
        if collection in prefix
    ]

    def count_and_pick(series: pd.Series, entries):
        if not entries:
            z = np.zeros(len(series), dtype=np.int64)
            return z, np.full(len(series), rules.UNDEFINED, dtype=object)
        masks = [series.str.contains(pat, regex=False).to_numpy() for pat, _ in entries]
        counts = np.sum(masks, axis=0)
        picked = np.select(masks, [srv for _, srv in entries], default=rules.UNDEFINED)
        return counts, picked

    fn_counts, fn_pick = count_and_pick(names, fn_entries)
    dir_counts, dir_pick = count_and_pick(paths, dir_entries)

    out = np.where(
        fn_counts == 1,
        fn_pick,
        np.where((fn_counts == 0) & (dir_counts == 1), dir_pick, rules.UNDEFINED),
    )
    return pd.Series(out, index=paths.index, dtype=object)


_COLLECTION_RULES = {
    "nbr": _rule_nbr,
    "scl": _rule_scl,
    "ven": _rule_ven,
    "dat": _rule_dat,
    "pre": _rule_pre,
}


def extract_server(paths: pd.Series, collection: str) -> pd.Series:
    """Vectorized analog of extract_log_server_name
    (/root/reference/libs/lib_file_name.py:120-136): dispatch on the
    collection to a rule, falling back to the generic lookup; empty string
    when no rule fires.
    """
    paths = paths.astype(object).fillna("")
    names = basename(paths)
    rule = _COLLECTION_RULES.get(collection)
    if rule is not None:
        return rule(paths, names)
    return _rule_generic(paths, names, collection)


def extract_server_one(path: str, collection: str) -> str:
    """Scalar convenience wrapper (unit tests / driver-side use)."""
    return extract_server(pd.Series([path]), collection).iloc[0]


def make_name(server: pd.Series, date: pd.Series) -> pd.Series:
    """server + '-' + date (/root/reference/libs/lib_file_name.py:166-168)."""
    return server.astype(str) + "-" + date.astype(str)


def summary_filename(paths: pd.Series) -> pd.Series:
    """basename + '.summary.txt' (/root/reference/libs/lib_file_name.py:171-172)."""
    return basename(paths) + ".summary.txt"


def gunzip_filename(names: pd.Series) -> pd.Series:
    """name + '.gz' (/root/reference/libs/lib_file_name.py:175-176)."""
    return names.astype(str) + ".gz"
