"""Summary parser (SURVEY.md M12/A4/A5): reversed-scan semantics,
tolerance window, RETRY_DIFF_LINES arithmetic (FIXTURES.md F4)."""

import pandas as pd

from matomo_log_analytics_ray.control import summary
from matomo_log_analytics_ray.control.status import (
    FILE_FAILED,
    FILE_LOADED,
    FILE_PARTIAL,
)

HAPPY = """
Logs import summary
-------------------
    100 requests imported successfully
    20 requests were downloads
    30 requests ignored:
        4 HTTP errors
        2 HTTP redirects
        6 invalid log lines
        10 requests done by bots
        5 requests to static resources
        3 filtered log lines

Performance summary
-------------------
    Total time: 42 seconds
"""


def test_happy_path_within_tolerance():
    out = summary.parse_summary_text(HAPPY, expected_lines=130)
    assert out["requests_imported_successfully"] == 100
    assert out["requests_ignored"] == 30
    assert out["http_errors"] == 4
    assert out["http_redirects"] == 2
    assert out["invalid_log_lines"] == 6
    assert out["requests_done_by_bots"] == 10
    assert out["requests_to_static_resources"] == 5
    assert out["filtered_log_lines"] == 3
    assert out["total_time"] == 42
    assert out["sum_imported_ignored_lines"] == 130
    assert out["status"] == FILE_LOADED
    assert out["lines_parsed"] == 130


def test_tolerance_is_plus_minus_one():
    for expected, want_status in [(129, FILE_LOADED), (131, FILE_LOADED), (132, 0)]:
        out = summary.parse_summary_text(HAPPY, expected_lines=expected)
        assert out["status"] == want_status, expected


def test_duplicate_counter_lines_last_occurrence_wins():
    text = HAPPY + "\n    999 requests imported successfully\n"
    out = summary.parse_summary_text(text, expected_lines=1029)
    # reversed scan sees the later line first
    assert out["requests_imported_successfully"] == 999
    assert out["sum_imported_ignored_lines"] == 1029
    assert out["status"] == FILE_LOADED


FAILURE_4INT = """
    50 requests imported successfully
    10 requests ignored
    2000000 lines parsed, 1999999 lines recorded, 100 records/s (avg), 200 records/s (max)
    Total time: 10 seconds
"""


def test_failure_path_four_integer_lines_parsed_within_tolerance():
    out = summary.parse_summary_text(FAILURE_4INT, expected_lines=2000001)
    assert out["status"] == FILE_LOADED
    assert out["lines_parsed"] == 2000000


def test_failure_path_retry_subtraction():
    out = summary.parse_summary_text(FAILURE_4INT, expected_lines=5000000)
    assert out["status"] == FILE_PARTIAL
    assert out["lines_parsed"] == 2000000 - summary.RETRY_DIFF_LINES


def test_failure_path_hard_failure():
    text = """
    5 requests imported successfully
    1 requests ignored
    100 lines parsed, 99 lines recorded, 1 records/s (avg), 2 records/s (max)
"""
    out = summary.parse_summary_text(text, expected_lines=999999)
    # 100 - RETRY_DIFF_LINES <= 0 -> FAILED with zero lines
    assert out["status"] == FILE_FAILED
    assert out["lines_parsed"] == 0


def test_failure_path_wrong_integer_count_is_failed():
    text = """
    5 requests imported successfully
    1 requests ignored
    100 lines parsed, 99 lines recorded
"""
    out = summary.parse_summary_text(text, expected_lines=50)
    assert out["status"] == FILE_FAILED
    assert out["lines_parsed"] == 0


def test_missing_total_time_defaults_zero():
    out = summary.parse_summary_text("10 requests imported successfully", 10)
    assert out["total_time"] == 0
    assert out["status"] == FILE_LOADED  # 10+0 within ±1 of 10


def test_batch_wrapper():
    df = pd.DataFrame(
        {
            "summary_id": ["a", "b"],
            "text": [HAPPY, FAILURE_4INT],
            "expected_lines": [130, 2000000],
        }
    )
    out = summary.parse_summaries_batch(df)
    assert out.shape[0] == 2
    assert out.loc[0, "status"] == FILE_LOADED
    assert out.loc[1, "status"] == FILE_LOADED
