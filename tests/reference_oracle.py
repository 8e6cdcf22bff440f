"""Scalar reference oracle for control-plane semantics.

A deliberately simple, per-path Python implementation of the reference
behaviors (routing, dates, validity, completeness), written directly
from the reference sources cited in SURVEY.md section 2. The engine's
vectorized kernels are property-tested against this oracle over the
fixture corpus — a parity check, not production code.
"""

from __future__ import annotations

import datetime
import re

FN_TABLE = {
    "scielo.ar.": ("arg", ""), "scielo.bo.": ("bol", ""), "scielo.cl.": ("chl", ""),
    "scielo.co.": ("col", ""), "scielo.cr.": ("cri", ""), "scielo.ec.": ("ecu", ""),
    "01_scielo.es.": ("esp", "1"), "02_scielo.es.": ("esp", "2"),
    "scielo.mx.": ("mex", ""), "scielo.pt.": ("prt", ""), "scielo.py.": ("pry", ""),
    "scielo.za.": ("sza", ""), "scielo.uy.": ("ury", ""),
    "caribbean.scielo.org.1.": ("wid", "1"), "caribbean.scielo.org.2.": ("wid", "2"),
    "scielo.pepsic.": ("psi", ""), "scielo.revenf.": ("rve", ""),
    "scielo.sp.1.": ("ssp", "1"), "scielo.sp.2.": ("ssp", "2"),
    "scielo.ss.": ("sss", ""), "scielo.nbr.2.": ("nbr", "2"), "scielo.nbr.4.": ("nbr", "4"),
}
DIR_TABLE = {"scielo.cu": ("cub", "")}

RE_V_END = r"scielo-org-ve.log-\d{4}-\d{2}-\d{2}\.gz"
RE_V_END_C = r"scielo-org-ve.log-\d{4}\d{2}\d{2}\.gz"
RE_V_START = r"^\d{4}-\d{2}-\d{2}.*ve-scielo-org.*\.log\.gz"


def _name(path):
    return path.rsplit("/", 1)[-1]


def server(path: str, collection: str) -> str:
    name = _name(path)
    if collection == "scl":
        if "node03" in path:
            return "node03"
        if "hiperion" in path:
            if "apache" in path:
                return "hiperion-apache"
            if "varnish" in path:
                return "hiperion-varnish"
        return ""
    if collection == "nbr":
        for pat, srv in [
            ("scielo.nbr.2.", "scl2"), ("scielo.nbr.4.", "scl4"),
            ("newbrvarnish02", "new-br3"), ("newbrvarnish03", "new-br4"),
            ("newbrvarnish05", "new-br5"), ("newbrvarnish06", "new-br6"),
        ]:
            if pat in path:
                return srv
        return ""
    if collection == "dat":
        if "dataverse" in path:
            return "data2" if "data.scielo" in name else "data1"
        return ""
    if collection == "pre":
        return "preprints" if ("preprints" in path and "preprints" in name) else ""
    if collection == "ven":
        if "apache" in path:
            if "centos-2gb-nyc3-01" in path:
                if re.search(RE_V_START, name):
                    return "ven1"
                if re.search(RE_V_END, name):
                    return "ven3"
                if re.search(RE_V_END_C, name):
                    return "ven4"
                return ""
            if "centos-2gb-nyc3-02" in path:
                if "scielo-org-ve" in path:
                    return "ven5" if re.search(RE_V_END, name) else ""
                if "varnish-aws" in path:
                    return "ven6"
                return ""
            if "ve-scielo-org-access" in name:
                return "ven1" if re.search(RE_V_START, name) else ""
            if "ve-scielo-org" in name:
                return "ven2" if re.search(RE_V_START, name) else ""
            return ""
        if "logs-ha" in path:
            return "ven7"
        return ""
    # generic
    hits = [p + n for pat, (p, n) in FN_TABLE.items() if pat in name and collection in p]
    if not hits:
        hits = [p + n for pat, (p, n) in DIR_TABLE.items() if pat in path and collection in p]
    return hits[0] if len(hits) == 1 else ""


def date(path: str) -> str:
    for regex, fmt in [(r"\d{4}-\d{2}-\d{2}", "%Y-%m-%d"), (r"[1-2]\d{3}[0-1]\d\d{2}", "%Y%m%d")]:
        m = re.search(regex, path)
        if m:
            try:
                return datetime.datetime.strptime(m.group(), fmt).strftime("%Y-%m-%d")
            except ValueError:
                pass
    return ""


def valid(collection: str, path: str, srv: str, dt: str) -> bool:
    d = datetime.datetime.strptime(dt, "%Y-%m-%d")
    cutoff = datetime.datetime(2020, 4, 29)
    if collection == "scl":
        if "varnishncsa" in path and d > cutoff:
            return False
        if srv == "hiperion-apache" and d > cutoff:
            return False
    if srv == "preprints":
        name = _name(path)
        if "error" in path or "preprints" not in name or not name.endswith(".log.gz"):
            return False
    if collection == "ven" and srv in {"ven1", "ven2", "ven3", "ven4", "ven5", "ven6"}:
        return False
    return True


def expected_daily(collection: str, dt: datetime.date) -> int:
    simple = {
        "arg": 1, "bol": 1, "chl": 1, "col": 1, "cri": 1, "cub": 1, "dat": 1,
        "ecu": 1, "esp": 2, "mex": 1, "pre": 1, "prt": 1, "pry": 1, "psi": 1,
        "rve": 1, "ssp": 2, "sss": 1, "sza": 1, "ury": 1, "ven": 1, "wid": 1,
    }
    if collection == "scl":
        return 1 if dt > datetime.date(2021, 5, 25) else 2
    if collection == "nbr":
        if dt > datetime.date(2022, 5, 8):
            return 2
        if dt > datetime.date(2022, 4, 5):
            return 3
        return 2
    return simple.get(collection, 2)


def date_status(statuses: list[int], collection: str, dt: datetime.date) -> int:
    n = sum(1 for s in statuses if s == 2)
    exp = expected_daily(collection, dt)
    if n == exp:
        return 2
    if 0 < n < exp:
        return 1
    return 0
