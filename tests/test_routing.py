"""Routing-key extraction (SURVEY.md M1-M7) vs the scalar reference oracle."""

import pandas as pd
import pytest

from matomo_log_analytics_ray.control import routing

from . import reference_oracle as ref

# FIXTURES.md F2 corpus: every branch of every rule.
CASES = [
    # scl (Brasil classic)
    ("scl", "/logs/node03/2020-01-01.log.gz", "node03"),
    ("scl", "/logs/hiperion/apache/2020-01-01.log.gz", "hiperion-apache"),
    ("scl", "/logs/hiperion/varnish/2020-01-01.log.gz", "hiperion-varnish"),
    ("scl", "/logs/hiperion/apache/varnish/x.log.gz", "hiperion-apache"),
    ("scl", "/logs/hiperion/other/x.log.gz", ""),
    ("scl", "/logs/unrelated/x.log.gz", ""),
    # nbr (Brasil new)
    ("nbr", "/logs/scielo.nbr.2.2022-01-01.log.gz", "scl2"),
    ("nbr", "/logs/scielo.nbr.4.2022-01-01.log.gz", "scl4"),
    ("nbr", "/logs/newbrvarnish02/x-2022-01-01.log.gz", "new-br3"),
    ("nbr", "/logs/newbrvarnish03/x-2022-01-01.log.gz", "new-br4"),
    ("nbr", "/logs/newbrvarnish05/x-2022-01-01.log.gz", "new-br5"),
    ("nbr", "/logs/newbrvarnish06/x-2022-01-01.log.gz", "new-br6"),
    ("nbr", "/logs/nothing/x.log.gz", ""),
    # dat (Dataverse)
    ("dat", "/logs/dataverse/data.scielo.2021-01-01.log.gz", "data2"),
    ("dat", "/logs/dataverse/plain-2021-01-01.log.gz", "data1"),
    ("dat", "/logs/other/plain.log.gz", ""),
    # pre (Preprints)
    ("pre", "/logs/preprints/preprints.2021-01-01.log.gz", "preprints"),
    ("pre", "/logs/preprints/other.2021-01-01.log.gz", ""),
    # filename containment implies path containment -> still preprints
    ("pre", "/logs/other/preprints.2021-01-01.log.gz", "preprints"),
    # ven (Venezuela) — all seven servers + regex edges
    ("ven", "/logs/apache/centos-2gb-nyc3-01/2021-01-01.ve-scielo-org.log.gz", "ven1"),
    ("ven", "/logs/apache/centos-2gb-nyc3-01/scielo-org-ve.log-2021-01-01.gz", "ven3"),
    ("ven", "/logs/apache/centos-2gb-nyc3-01/scielo-org-ve.log-20210101.gz", "ven4"),
    ("ven", "/logs/apache/centos-2gb-nyc3-01/nomatch.log.gz", ""),
    ("ven", "/logs/apache/centos-2gb-nyc3-02/scielo-org-ve/scielo-org-ve.log-2021-01-01.gz", "ven5"),
    ("ven", "/logs/apache/centos-2gb-nyc3-02/scielo-org-ve/other.log.gz", ""),
    ("ven", "/logs/apache/centos-2gb-nyc3-02/varnish-aws/x.log.gz", "ven6"),
    ("ven", "/logs/apache/2021-01-01.ve-scielo-org-access.log.gz", "ven1"),
    ("ven", "/logs/apache/2021-01-01.ve-scielo-org.log.gz", "ven2"),
    ("ven", "/logs/apache/ve-scielo-org-access.log.gz", ""),
    ("ven", "/logs/logs-ha/x.log.gz", "ven7"),
    ("ven", "/logs/nothing/x.log.gz", ""),
    # generic collections — one per filename-table entry
    ("arg", "/usage/arg/scielo.ar.2021-01-01.log.gz", "arg"),
    ("bol", "/usage/bol/scielo.bo.2021-01-01.log.gz", "bol"),
    ("chl", "/usage/chl/scielo.cl.2021-01-01.log.gz", "chl"),
    ("col", "/usage/col/scielo.co.2021-01-01.log.gz", "col"),
    ("cri", "/usage/cri/scielo.cr.2021-01-01.log.gz", "cri"),
    ("ecu", "/usage/ecu/scielo.ec.2021-01-01.log.gz", "ecu"),
    ("esp", "/usage/esp/01_scielo.es.2021-01-01.log.gz", "esp1"),
    ("esp", "/usage/esp/02_scielo.es.2021-01-01.log.gz", "esp2"),
    ("mex", "/usage/mex/scielo.mx.2021-01-01.log.gz", "mex"),
    ("prt", "/usage/prt/scielo.pt.2021-01-01.log.gz", "prt"),
    ("pry", "/usage/pry/scielo.py.2021-01-01.log.gz", "pry"),
    ("sza", "/usage/sza/scielo.za.2021-01-01.log.gz", "sza"),
    ("ury", "/usage/ury/scielo.uy.2021-01-01.log.gz", "ury"),
    ("wid", "/usage/wid/caribbean.scielo.org.1.2021-01-01.log.gz", "wid1"),
    ("wid", "/usage/wid/caribbean.scielo.org.2.2021-01-01.log.gz", "wid2"),
    ("psi", "/usage/psi/scielo.pepsic.2021-01-01.log.gz", "psi"),
    ("rve", "/usage/rve/scielo.revenf.2021-01-01.log.gz", "rve"),
    ("ssp", "/usage/ssp/scielo.sp.1.2021-01-01.log.gz", "ssp1"),
    ("ssp", "/usage/ssp/scielo.sp.2.2021-01-01.log.gz", "ssp2"),
    ("sss", "/usage/sss/scielo.ss.2021-01-01.log.gz", "sss"),
    # dir-table entry (cub) — matched on the directory, not the filename
    ("cub", "/usage/scielo.cu/access-2021-01-01.log.gz", "cub"),
    # ambiguous multi-match -> undefined (two wid patterns in one name)
    ("wid", "/usage/wid/caribbean.scielo.org.1.caribbean.scielo.org.2.log.gz", ""),
    # no match -> undefined
    ("arg", "/usage/arg/unknown-2021-01-01.log.gz", ""),
    # collection-prefix substring post-filter: 'nbr' entries visible to
    # the generic rule only for matching collections
    ("xxx", "/usage/scielo.nbr.2.2021-01-01.log.gz", ""),
]


@pytest.mark.parametrize("collection,path,expected", CASES)
def test_scalar_cases(collection, path, expected):
    assert routing.extract_server_one(path, collection) == expected
    # parity with the independent scalar oracle
    assert ref.server(path, collection) == expected


def test_vectorized_matches_oracle_whole_corpus():
    for collection in sorted({c for c, _, _ in CASES}):
        paths = pd.Series([p for _, p, _ in CASES])
        got = routing.extract_server(paths, collection)
        want = [ref.server(p, collection) for p in paths]
        assert got.tolist() == want, f"mismatch for collection={collection}"


def test_name_builders():
    s = pd.Series(["/a/b/file.log.gz"])
    assert routing.basename(s).iloc[0] == "file.log.gz"
    assert routing.summary_filename(s).iloc[0] == "file.log.gz.summary.txt"
    assert routing.gunzip_filename(pd.Series(["x.log"])).iloc[0] == "x.log.gz"
    assert (
        routing.make_name(pd.Series(["srv"]), pd.Series(["2021-01-01"])).iloc[0]
        == "srv-2021-01-01"
    )
