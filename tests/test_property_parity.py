"""Property-based parity: vectorized control-plane kernels vs the
clean-room scalar oracle, over randomly composed paths (hypothesis)."""

import hypothesis.strategies as st
import pandas as pd
from hypothesis import given, settings

from matomo_log_analytics_ray.control import dates, routing, status, validity

from . import reference_oracle as ref

_SEGMENTS = st.sampled_from(
    [
        "node03", "hiperion", "apache", "varnish", "varnishncsa", "logs",
        "scielo.nbr.2.", "newbrvarnish02", "dataverse", "data.scielo",
        "preprints", "error", "centos-2gb-nyc3-01", "centos-2gb-nyc3-02",
        "scielo-org-ve", "varnish-aws", "ve-scielo-org-access", "ve-scielo-org",
        "logs-ha", "scielo.ar.", "scielo.cu", "caribbean.scielo.org.1.",
        "2021-03-04", "20210304", "2020-13-45", "x", "access",
    ]
)
_SEP = st.sampled_from(["/", ".", "-", ""])
_PATHS = st.lists(st.tuples(_SEGMENTS, _SEP), min_size=1, max_size=8).map(
    lambda parts: "/" + "".join(a + b for a, b in parts) + ".log.gz"
)
_COLLECTIONS = st.sampled_from(["scl", "nbr", "ven", "dat", "pre", "arg", "cub", "zzz"])


@settings(max_examples=300, deadline=None)
@given(st.lists(_PATHS, min_size=1, max_size=20), _COLLECTIONS)
def test_routing_parity(paths, collection):
    got = routing.extract_server(pd.Series(paths), collection).tolist()
    want = [ref.server(p, collection) for p in paths]
    assert got == want


@settings(max_examples=300, deadline=None)
@given(st.lists(_PATHS, min_size=1, max_size=20))
def test_date_parity(paths):
    got = dates.extract_date(pd.Series(paths)).tolist()
    want = [ref.date(p) for p in paths]
    assert got == want


@settings(max_examples=200, deadline=None)
@given(
    st.lists(_PATHS, min_size=1, max_size=10),
    _COLLECTIONS,
    st.sampled_from(["node03", "hiperion-apache", "preprints", "ven1", "ven7", ""]),
    st.dates(),
)
def test_validity_parity(paths, collection, server, d):
    ds = d.isoformat()
    got = validity.is_valid(
        collection,
        pd.Series(paths),
        pd.Series([server] * len(paths)),
        pd.Series([ds] * len(paths)),
    ).tolist()
    want = [ref.valid(collection, p, server, ds) for p in paths]
    assert got == want


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=5), min_size=0, max_size=8),
    _COLLECTIONS,
    st.dates(),
)
def test_date_status_parity(statuses, collection, d):
    n_loaded = sum(1 for s in statuses if s == status.FILE_LOADED)
    got = status.compute_date_status(
        pd.Series([n_loaded]), pd.Series([collection]), pd.Series([d.isoformat()])
    ).iloc[0]
    assert got == ref.date_status(statuses, collection, d)
