"""Validity predicate (SURVEY.md F2): date-conditional rules, both sides
of each boundary; invalid rows are routed, never dropped."""

import pandas as pd

from matomo_log_analytics_ray.control import validity

from . import reference_oracle as ref

CASES = [
    # (collection, path, server, date, expected_valid)
    # scl varnishncsa boundary 2020-04-29 (strictly-after is invalid)
    ("scl", "/l/varnishncsa/x.log.gz", "node03", "2020-04-29", True),
    ("scl", "/l/varnishncsa/x.log.gz", "node03", "2020-04-30", False),
    ("scl", "/l/varnishncsa/x.log.gz", "node03", "2020-04-28", True),
    # scl hiperion-apache boundary
    ("scl", "/l/hiperion/apache/x.log.gz", "hiperion-apache", "2020-04-29", True),
    ("scl", "/l/hiperion/apache/x.log.gz", "hiperion-apache", "2020-04-30", False),
    # same server, different collection -> rule does not apply
    ("xxx", "/l/hiperion/apache/x.log.gz", "hiperion-apache", "2021-01-01", True),
    # preprints rules key on the SERVER, not the collection
    ("pre", "/l/preprints/error/preprints.log.gz", "preprints", "2021-01-01", False),
    ("pre", "/l/preprints/other.log.gz", "preprints", "2021-01-01", False),
    ("pre", "/l/preprints/preprints.log", "preprints", "2021-01-01", False),
    ("pre", "/l/preprints/preprints.log.gz", "preprints", "2021-01-01", True),
    # ven invalid servers
    ("ven", "/l/apache/x.log.gz", "ven1", "2021-01-01", False),
    ("ven", "/l/apache/x.log.gz", "ven6", "2021-01-01", False),
    ("ven", "/l/logs-ha/x.log.gz", "ven7", "2021-01-01", True),
    # invalid server name under a different collection is fine
    ("scl", "/l/x.log.gz", "ven1", "2021-01-01", True),
]


def test_cases_and_oracle_parity():
    for coll, path, srv, dt, expected in CASES:
        assert validity.is_valid_one(coll, path, srv, dt) is expected, (coll, path)
        assert ref.valid(coll, path, srv, dt) is expected, (coll, path)


def test_vectorized_mixed_collections():
    df = pd.DataFrame(CASES, columns=["c", "p", "s", "d", "want"])
    got = validity.is_valid(df["c"], df["p"], df["s"], df["d"])
    assert got.tolist() == df["want"].tolist()
