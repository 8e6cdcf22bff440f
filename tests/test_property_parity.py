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


# ---------------------------------------------------------------------------
# Parse round-trip: random field values -> composed log lines -> the
# cascade must claim the right format and extract every field verbatim.
# ---------------------------------------------------------------------------
import pyarrow as pa

from matomo_log_analytics_ray import schemas
from matomo_log_analytics_ray.stages import parse

_IP = st.from_regex(r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}", fullmatch=True)
_METHOD = st.sampled_from(["GET", "POST", "HEAD", "PUT"])
# format-legal path charset: no spaces/quotes/tabs (a real uri-stem)
_PATH = st.from_regex(r"/[a-zA-Z0-9_./?=&%-]{0,40}", fullmatch=True)
_STATUS = st.integers(100, 599)
_BYTES = st.integers(0, 10**12)
_REF = st.sampled_from(["-", "https://r.example/x", ""])
# agent may hold spaces/parens but not quotes (the quoted-field charset)
_AGENT = st.from_regex(r"[a-zA-Z0-9 ()/;._+-]{1,40}", fullmatch=True)


def _mk_batch(texts):
    n = len(texts)
    return pa.table(
        {
            "conv_id": pa.array([f"c{i}" for i in range(n)], pa.string()),
            "turn_idx": pa.array([0] * n, pa.int32()),
            "role": pa.array(["user"] * n, pa.string()),
            "text": pa.array(texts, pa.large_string()),
            "tool": pa.array([""] * n, pa.string()),
            "ts": pa.array([0] * n, pa.timestamp("us")),
        },
        schema=schemas.TRANSCRIPTS,
    )


@settings(max_examples=150, deadline=None)
@given(_IP, _METHOD, _PATH, _STATUS, _BYTES, _REF, _AGENT)
def test_parse_round_trip_all_formats(ip, method, path, st_, nb, ref, agent):
    clock = "12/Jan/2024:10:00:05 +0000"
    agent_plus = agent.replace(" ", "+")
    lines = {
        "ncsa_extended": f'{ip} - - [{clock}] "{method} {path} HTTP/1.1" {st_} {nb} "{ref}" "{agent}"',
        "nginx_json": (
            f'{{"remote_addr":"{ip}","time":"2024-01-12T10:00:05Z","method":"{method}",'
            f'"path":"{path}","status":{st_},"bytes":{nb},"referer":"{ref}","ua":"{agent}"}}'
        ),
        "w3c_extended": f"2024-01-12 10:00:05 {ip} {method} {path} {st_} {nb} {agent_plus}",
        "common": f'{ip} - - [{clock}] "{method} {path} HTTP/1.1" {st_} {nb}',
        "common_vhost": f'h.example {ip} - - [{clock}] "{method} {path} HTTP/1.1" {st_} {nb}',
        "icecast2": f'{ip} - - [{clock}] "{method} {path} HTTP/1.1" {st_} {nb} "{ref}" "{agent}" 42',
    }
    fmts = list(lines)
    t = parse.parse_batch(_mk_batch([lines[f] for f in fmts]))
    assert t["fmt"].to_pylist() == fmts
    assert t["ip"].to_pylist() == [ip] * len(fmts)
    assert t["method"].to_pylist() == [method] * len(fmts)
    assert t["path"].to_pylist() == [path] * len(fmts)
    assert t["http_status"].to_pylist() == [st_] * len(fmts)
    assert t["bytes"].to_pylist() == [nb] * len(fmts)
    ua = t["user_agent"].to_pylist()
    assert ua[0] == agent and ua[1] == agent and ua[2] == agent_plus
