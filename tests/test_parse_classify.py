"""Pure-kernel tests for the parse cascade and outcome classifier
(SURVEY.md M13, F5) — no Ray needed; zero-copy Arrow in/out."""

import pyarrow as pa

from matomo_log_analytics_ray import schemas
from matomo_log_analytics_ray.stages import classify, parse

NCSA_OK = '1.2.3.4 - - [12/Jan/2024:10:00:00 +0000] "GET /article/view/1 HTTP/1.1" 200 5120 "-" "Mozilla/5.0 (X11) Firefox"'
NCSA_BOT = '1.2.3.4 - - [12/Jan/2024:10:00:00 +0000] "GET /a HTTP/1.1" 200 10 "-" "Googlebot/2.1 (+http://www.google.com/bot.html)"'
NCSA_404 = '1.2.3.4 - - [12/Jan/2024:10:00:00 +0000] "GET /missing HTTP/1.1" 404 10 "-" "Mozilla/5.0"'
NCSA_301 = '1.2.3.4 - - [12/Jan/2024:10:00:00 +0000] "GET /old HTTP/1.1" 301 10 "-" "Mozilla/5.0"'
NCSA_CSS = '1.2.3.4 - - [12/Jan/2024:10:00:00 +0000] "GET /static/app.css HTTP/1.1" 200 10 "-" "Mozilla/5.0"'
NCSA_ADM = '1.2.3.4 - - [12/Jan/2024:10:00:00 +0000] "GET /admin/login HTTP/1.1" 200 10 "-" "Mozilla/5.0"'
NGINX_OK = '{"remote_addr":"2.3.4.5","time":"2024-01-12T10:00:00Z","method":"POST","path":"/api/v1/export","status":200,"bytes":77,"referer":"-","ua":"curl/8.4.0"}'
W3C_OK = "2024-01-12 10:00:00 3.4.5.6 GET /journal/x 200 999 Mozilla/5.0+(Mac)"
COMMON_OK = '7.7.7.7 - - [12/Jan/2024:10:00:00 +0000] "GET /journal/abc HTTP/1.1" 200 321'
VHOST_OK = 'scielo.br 8.8.8.8 - - [12/Jan/2024:10:00:00 +0000] "GET /x HTTP/1.1" 500 5'
PROSE = "please summarize the access pattern for this conversation"
TRUNC = NCSA_OK[:25]
ICECAST_OK = NCSA_OK + " 3599"
CF_OK = "2024-01-12\t10:00:00\tIAD79-C1\t4096\t9.9.9.9\tGET\tscielo.br\t/stream/a\t200\t-\tMozilla/5.0+(X11)"
ELB_OK = (
    "2024-01-12T10:00:00Z prod-elb 4.4.4.4:52000 10.0.0.9:80 0.000500 0.001000 0.000200 "
    '200 200 0 8192 "GET /api/v1/export HTTP/1.1" "Mozilla/5.0 (X11)" ECDHE-RSA TLSv1.2'
)
S3_OK = (
    '79a5 scielo.br [12/Jan/2024:10:00:00 +0000] 5.5.5.5 - 3E57 REST.GET.OBJECT key1 '
    '"GET /pdf/read/889 HTTP/1.1" 200 - 2048 2048 12 11 "-" "curl/8.4.0" -'
)
IIS_OK = "2024-01-12 10:00:00 10.0.0.1 GET /index.html - 443 - 6.6.6.6 Mozilla/5.0+(Mac) 200 0 0 112"


def _mk(texts):
    n = len(texts)
    return pa.table(
        {
            "conv_id": pa.array([f"conv-{i:08d}" for i in range(n)], pa.string()),
            "turn_idx": pa.array([0] * n, pa.int32()),
            "role": pa.array(["user"] * n, pa.string()),
            "text": pa.array(texts, pa.large_string()),
            "tool": pa.array([""] * n, pa.string()),
            "ts": pa.array([0] * n, pa.timestamp("us")),
        },
        schema=schemas.TRANSCRIPTS,
    )


def test_parse_cascade_and_fields():
    t = parse.parse_batch(_mk([NCSA_OK, NGINX_OK, W3C_OK, PROSE, TRUNC]))
    assert t["fmt"].to_pylist() == [
        "ncsa_extended",
        "nginx_json",
        "w3c_extended",
        None,
        None,
    ]
    assert t["ip"].to_pylist()[:3] == ["1.2.3.4", "2.3.4.5", "3.4.5.6"]
    assert t["method"].to_pylist()[:3] == ["GET", "POST", "GET"]
    assert t["path"].to_pylist()[:3] == ["/article/view/1", "/api/v1/export", "/journal/x"]
    assert t["http_status"].to_pylist() == [200, 200, 200, None, None]
    assert t["bytes"].to_pylist()[:3] == [5120, 77, 999]
    assert t["referrer"].to_pylist()[2] is None  # w3c has no referrer field
    assert t["user_agent"].to_pylist()[2] == "Mozilla/5.0+(Mac)"


def test_common_and_vhost_formats():
    t = parse.parse_batch(_mk([COMMON_OK, VHOST_OK, NCSA_OK]))
    assert t["fmt"].to_pylist() == ["common", "common_vhost", "ncsa_extended"]
    assert t["ip"].to_pylist() == ["7.7.7.7", "8.8.8.8", "1.2.3.4"]
    assert t["vhost"].to_pylist() == [None, "scielo.br", None]
    assert t["user_agent"].to_pylist()[:2] == [None, None]
    # null agent must not poison classification (non-Kleene and_)
    c = classify.classify_batch(t)
    assert c["outcome"].to_pylist() == ["imported", "http_error", "imported"]


CC_OK = "scielo.br " + NCSA_OK


def test_cloud_and_streaming_formats():
    t = parse.parse_batch(_mk([ICECAST_OK, CF_OK, ELB_OK, S3_OK, IIS_OK, NCSA_OK, CC_OK]))
    assert t["fmt"].to_pylist() == [
        "icecast2", "amazon_cloudfront", "elb", "s3", "iis", "ncsa_extended",
        "common_complete",
    ]
    assert t["vhost"].to_pylist()[6] == "scielo.br"
    assert t["referrer"].to_pylist()[6] == "-"
    assert t["ip"].to_pylist()[:5] == ["1.2.3.4", "9.9.9.9", "4.4.4.4", "5.5.5.5", "6.6.6.6"]
    assert t["path"].to_pylist()[:5] == [
        "/article/view/1", "/stream/a", "/api/v1/export", "/pdf/read/889", "/index.html",
    ]
    assert t["http_status"].to_pylist() == [200] * 7
    # iis has no bytes field; cloudfront carries vhost; elb has no referrer
    assert t["bytes"].to_pylist() == [5120, 4096, 8192, 2048, None, 5120, 5120]
    assert t["vhost"].to_pylist()[:4] == [None, "scielo.br", None, "scielo.br"]
    assert t["referrer"].to_pylist()[2] is None
    # a trailing-duration line must NOT be claimed by plain ncsa_extended
    c = classify.classify_batch(t)
    assert c["outcome"].to_pylist()[3] == "bot"  # curl UA in the s3 line


def test_outcome_precedence():
    texts = [NCSA_OK, PROSE, NCSA_ADM, NCSA_CSS, NCSA_BOT, NCSA_301, NCSA_404, NGINX_OK]
    t = classify.classify_batch(parse.parse_batch(_mk(texts)))
    assert t["outcome"].to_pylist() == [
        "imported",
        "invalid",
        "filtered",   # /admin beats status/bot checks
        "static",
        "bot",
        "http_redirect",
        "http_error",
        "bot",        # curl UA counts as bot even with status 200
    ]
    for o in t["outcome"].to_pylist():
        assert o in schemas.OUTCOMES


def test_every_row_gets_exactly_one_outcome():
    texts = [NCSA_OK, PROSE, TRUNC, W3C_OK, NGINX_OK] * 10
    t = classify.classify_batch(parse.parse_batch(_mk(texts)))
    assert t["outcome"].null_count == 0
    assert len(t) == len(texts)


def test_log_ts_extraction_per_family():
    t = parse.parse_batch(_mk([NCSA_OK, NGINX_OK, W3C_OK, CF_OK, ELB_OK, S3_OK, IIS_OK, ICECAST_OK, PROSE]))
    ts = t["log_ts"].to_pylist()
    import datetime as dt
    want = dt.datetime(2024, 1, 12, 10, 0, 0)
    assert ts[:8] == [want] * 8  # every format carries the same clock
    assert ts[8] is None  # prose has no parseable time


SHOUTCAST_OK = "7.7.7.7 client.example 2024-01-12 10:00:00 /stream 200 WinampMPEG/5.0 4096 120 128"


def test_shoutcast_format():
    t = parse.parse_batch(_mk([SHOUTCAST_OK, IIS_OK, W3C_OK]))
    assert t["fmt"].to_pylist() == ["shoutcast", "iis", "w3c_extended"]
    assert t["ip"].to_pylist()[0] == "7.7.7.7"
    assert t["path"].to_pylist()[0] == "/stream"
    assert t["bytes"].to_pylist()[0] == 4096
    assert t["method"].to_pylist()[0] is None  # shoutcast has no method field
    import datetime as dt
    assert t["log_ts"].to_pylist()[0] == dt.datetime(2024, 1, 12, 10, 0, 0)


def test_empty_batch_through_all_kernels():
    from matomo_log_analytics_ray.stages import enrich

    empty = schemas.TRANSCRIPTS.empty_table()
    t = classify.classify_batch(parse.parse_batch(empty))
    assert t.num_rows == 0
    r = enrich.resolve_sinks_arrow(t, enrich.DEFAULT_TOOL_SINKS)
    assert r.num_rows == 0 and "sink" in r.schema.names
