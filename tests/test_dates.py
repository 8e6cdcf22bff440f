"""Date extraction (SURVEY.md M8): multi-format, first-match-wins,
strptime-validated."""

import pandas as pd

from matomo_log_analytics_ray.control import dates

from . import reference_oracle as ref

CASES = [
    ("/logs/x/access-2021-03-04.log.gz", "2021-03-04"),
    ("/logs/x/access.20210304.log.gz", "2021-03-04"),
    # invalid hyphenated date (regex hit, strptime reject) with no
    # compact fallback elsewhere in the path
    ("/logs/x/access-2020-13-45.log.gz", ""),
    # invalid hyphenated date, but a VALID compact date elsewhere:
    # cascade falls through to the second format
    ("/logs/20200115/access-2020-13-45.log.gz", "2020-01-15"),
    # first occurrence wins within a format
    ("/logs/2019-01-01/access-2021-03-04.log.gz", "2019-01-01"),
    # hyphenated beats compact even when compact appears first
    ("/logs/20180101/access-2021-03-04.log.gz", "2021-03-04"),
    # no date
    ("/logs/x/access.log.gz", ""),
    # compact regex requires [1-2]\d{3}[0-1]\d\d{2}
    ("/logs/x/access.30200101.log.gz", ""),
    ("/logs/x/access.20201301.log.gz", ""),  # month 13 -> strptime reject
    # leap-day validation
    ("/logs/x/a-2020-02-29.log.gz", "2020-02-29"),
    ("/logs/x/a-2021-02-29.log.gz", ""),
]


def test_cases_and_oracle_parity():
    paths = pd.Series([p for p, _ in CASES])
    got = dates.extract_date(paths).tolist()
    assert got == [e for _, e in CASES]
    assert got == [ref.date(p) for p, _ in CASES]


def test_scalar_wrapper():
    assert dates.extract_date_one("x-2022-12-31.log") == "2022-12-31"
