"""Status lattices + piecewise completeness (SURVEY.md A2, T1, T2)."""

import datetime

import pandas as pd

from matomo_log_analytics_ray.control import status as st

from . import reference_oracle as ref


def test_file_status_lattice_loaded_absorbing():
    cur = pd.Series([st.FILE_LOADED, st.FILE_QUEUE, st.FILE_PARTIAL, st.FILE_LOADING])
    prop = pd.Series([st.FILE_QUEUE, st.FILE_LOADING, st.FILE_LOADED, st.FILE_FAILED])
    out = st.merge_file_status(cur, prop)
    assert out.tolist() == [st.FILE_LOADED, st.FILE_LOADING, st.FILE_LOADED, st.FILE_FAILED]
    # idempotent under replay
    again = st.merge_file_status(out, prop)
    assert again.tolist() == [st.FILE_LOADED, st.FILE_LOADING, st.FILE_LOADED, st.FILE_FAILED]


def test_date_status_guarded_upgrade():
    cur = pd.Series([st.DATE_QUEUE, st.DATE_PARTIAL, st.DATE_LOADED, st.DATE_COMPLETED])
    prop = pd.Series([st.DATE_LOADED, st.DATE_LOADED, st.DATE_QUEUE, st.DATE_QUEUE])
    out = st.merge_date_status(cur, prop)
    # only QUEUE/PARTIAL rows change; LOADED+ are owned downstream
    assert out.tolist() == [st.DATE_LOADED, st.DATE_LOADED, st.DATE_LOADED, st.DATE_COMPLETED]


# Boundary matrix per FIXTURES.md F3: scl at 2021-05-25, nbr at
# 2022-04-05 / 2022-05-08, simple-table collection, unknown default.
EXPECTED_CASES = [
    ("scl", "2021-05-25", 2),
    ("scl", "2021-05-26", 1),
    ("nbr", "2022-04-05", 2),
    ("nbr", "2022-04-06", 3),
    ("nbr", "2022-05-08", 3),
    ("nbr", "2022-05-09", 2),
    ("esp", "2021-01-01", 2),
    ("arg", "2021-01-01", 1),
    ("zzz", "2021-01-01", 2),  # unknown collection -> default
]


def test_expected_daily_count():
    df = pd.DataFrame(EXPECTED_CASES, columns=["c", "d", "want"])
    got = st.expected_daily_count(df["c"], df["d"])
    assert got.tolist() == df["want"].tolist()
    for c, d, want in EXPECTED_CASES:
        assert ref.expected_daily(c, datetime.date.fromisoformat(d)) == want


def test_compute_date_status_matrix():
    cases = [
        # (n_loaded, collection, date, expected)
        (1, "scl", "2021-05-26", st.DATE_LOADED),
        (2, "scl", "2021-05-25", st.DATE_LOADED),
        (1, "scl", "2021-05-25", st.DATE_PARTIAL),
        (0, "scl", "2021-05-25", st.DATE_QUEUE),
        (3, "scl", "2021-05-25", st.DATE_QUEUE),  # over-count falls to QUEUE
        (3, "nbr", "2022-04-06", st.DATE_LOADED),
        (2, "nbr", "2022-04-06", st.DATE_PARTIAL),
        (1, "arg", "2021-01-01", st.DATE_LOADED),
    ]
    df = pd.DataFrame(cases, columns=["n", "c", "d", "want"])
    got = st.compute_date_status(df["n"], df["c"], df["d"])
    assert got.tolist() == df["want"].tolist()
    for n, c, d, want in cases:
        statuses = [st.FILE_LOADED] * n
        assert ref.date_status(statuses, c, datetime.date.fromisoformat(d)) == want
