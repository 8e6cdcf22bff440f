"""Declarative rule tables for routing-key extraction, validity and
completeness semantics.

Semantics reproduced from the reference (values:
/root/reference/libs/values.py:1-95, thresholds:
/root/reference/libs/lib_status.py:21-53) but restructured as data: the
new engine evaluates these tables with vectorized substring/regex masks
instead of per-path Python branching, and new collections extend the
tables rather than the code (user-extension surface, SURVEY.md 2.11).
"""

# ---------------------------------------------------------------------------
# Substring -> (collection_prefix, server_number) lookup tables used by the
# generic ("ratchet") routing rule. Matching is *substring containment*, not
# equality — these drive a broadcast mask cascade, never an equality join.
# Reference: /root/reference/libs/values.py:55-82.
# ---------------------------------------------------------------------------
FILENAME_PATTERN_TO_SERVER = {
    "scielo.ar.": ("arg", ""),
    "scielo.bo.": ("bol", ""),
    "scielo.cl.": ("chl", ""),
    "scielo.co.": ("col", ""),
    "scielo.cr.": ("cri", ""),
    "scielo.ec.": ("ecu", ""),
    "01_scielo.es.": ("esp", "1"),
    "02_scielo.es.": ("esp", "2"),
    "scielo.mx.": ("mex", ""),
    "scielo.pt.": ("prt", ""),
    "scielo.py.": ("pry", ""),
    "scielo.za.": ("sza", ""),
    "scielo.uy.": ("ury", ""),
    "caribbean.scielo.org.1.": ("wid", "1"),
    "caribbean.scielo.org.2.": ("wid", "2"),
    "scielo.pepsic.": ("psi", ""),
    "scielo.revenf.": ("rve", ""),
    "scielo.sp.1.": ("ssp", "1"),
    "scielo.sp.2.": ("ssp", "2"),
    "scielo.ss.": ("sss", ""),
    "scielo.nbr.2.": ("nbr", "2"),
    "scielo.nbr.4.": ("nbr", "4"),
}

DIR_PATTERN_TO_SERVER = {
    "scielo.cu": ("cub", ""),
}

# Sentinel for "no routing key could be derived".
UNDEFINED = ""

# Brasil-new-site substring -> server cascade (first match wins).
# Reference: /root/reference/libs/lib_file_name.py:73-85.
NBR_PATTERNS = [
    ("scielo.nbr.2.", "scl2"),
    ("scielo.nbr.4.", "scl4"),
    ("newbrvarnish02", "new-br3"),
    ("newbrvarnish03", "new-br4"),
    ("newbrvarnish05", "new-br5"),
    ("newbrvarnish06", "new-br6"),
]

# ---------------------------------------------------------------------------
# Venezuela filename regexes (reference: /root/reference/libs/values.py:43-45).
# RE2-compatible so the same strings run under pyarrow.compute and DuckDB.
# ---------------------------------------------------------------------------
RE_VEN_ENDS_WITH_DATE = r"scielo-org-ve.log-\d{4}-\d{2}-\d{2}\.gz"
RE_VEN_ENDS_WITH_DATE_NO_HYPHEN = r"scielo-org-ve.log-\d{4}\d{2}\d{2}\.gz"
RE_VEN_STARTS_WITH_DATE = r"^\d{4}-\d{2}-\d{2}.*ve-scielo-org.*\.log\.gz"

# Servers whose files are registered but never loaded
# (reference: /root/reference/libs/values.py:88-95).
INVALID_SERVERS = frozenset({"ven1", "ven2", "ven3", "ven4", "ven5", "ven6"})

# ---------------------------------------------------------------------------
# Date-extraction regexes (reference: /root/reference/libs/lib_file_name.py:14-15).
# First-match-wins cascade: hyphenated first, then compact.
# ---------------------------------------------------------------------------
RE_DATE_HYPHEN = r"\d{4}-\d{2}-\d{2}"
RE_DATE_COMPACT = r"[1-2]\d{3}[0-1]\d\d{2}"

# ---------------------------------------------------------------------------
# Expected number of LOADED files per (collection, day); piecewise by date
# for scl and nbr. Encoded as data: (collection -> list of
# (cutoff_exclusive_after, expected)) evaluated top-down, last row is the
# default. Reference: /root/reference/libs/lib_status.py:21-53,56-82.
# A date strictly AFTER the cutoff takes that row's value.
# ---------------------------------------------------------------------------
DAILY_EXPECTED_DEFAULT = 2

DAILY_EXPECTED = {
    "arg": 1, "bol": 1, "chl": 1, "col": 1, "cri": 1, "cub": 1, "dat": 1,
    "ecu": 1, "esp": 2, "mex": 1, "pre": 1, "prt": 1, "pry": 1, "psi": 1,
    "rve": 1, "ssp": 2, "sss": 1, "sza": 1, "ury": 1, "ven": 1, "wid": 1,
}

# Piecewise rows: evaluated in order; first row whose cutoff the date
# exceeds wins; the final (None, n) row is the fallback.
DAILY_EXPECTED_PIECEWISE = {
    "scl": [("2021-05-25", 1), (None, 2)],
    "nbr": [("2022-05-08", 2), ("2022-04-05", 3), (None, 2)],
}

# ---------------------------------------------------------------------------
# Validity rules (reference: /root/reference/libs/lib_status.py:85-116).
# Date boundary shared by the two scl anonymous-IP rules.
# ---------------------------------------------------------------------------
SCL_ANON_IP_CUTOFF = "2020-04-29"  # files dated strictly after are invalid
