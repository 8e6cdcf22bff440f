"""Grok/regex log-line parse over the transcripts ``text`` column.

The Ray-native analog of import_logs.py's format-detection parsers
(evidence for the format taxonomy: counter columns
/root/reference/models/declarative.py:37-42 and the summary counters
/root/reference/libs/lib_summary.py:10-20; formats are public Matomo
knowledge). Twelve formats are recognized in a FIRST-MATCH-WINS cascade
(mirroring the reference's cascaded extraction idiom,
/root/reference/libs/lib_file_name.py:153-163): ncsa_extended,
nginx_json, w3c_extended, icecast2, amazon_cloudfront, elb, s3, iis,
shoutcast, common_complete, common_vhost, common. A line matching none parses to
fmt=null (-> outcome 'invalid'). A second small cascade (TS_FAMILIES)
parses each line's own clock into a ``log_ts`` timestamp column.

All patterns are RE2-compatible and are interpolated VERBATIM into the
DuckDB oracle SQL (__ray_entry__.oracle_sql), so the Ray pipeline and
the oracle provably run the same extraction. The kernel is
pyarrow.compute.extract_regex over zero-copy Arrow batches — no Python
row loop.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# Named-group patterns; group order is the DuckDB group index order.
RE_NCSA = (
    r'^(?P<ip>\S+) \S+ \S+ \[(?:[^\]]+)\] '
    r'"(?P<method>\S+) (?P<path>\S+)[^"]*" '
    r'(?P<status>\d{3}) (?P<bytes>\d+) '
    r'"(?P<referrer>[^"]*)" "(?P<agent>[^"]*)"$'
)
RE_NGINX_JSON = (
    r'^\{"remote_addr":"(?P<ip>[^"]*)","time":"(?:[^"]*)",'
    r'"method":"(?P<method>[^"]*)","path":"(?P<path>[^"]*)",'
    r'"status":(?P<status>\d+),"bytes":(?P<bytes>\d+),'
    r'"referer":"(?P<referrer>[^"]*)","ua":"(?P<agent>[^"]*)"\}$'
)
RE_W3C = (
    r'^(?:\d{4}-\d{2}-\d{2}) (?:\d{2}:\d{2}:\d{2}) (?P<ip>\S+) '
    r'(?P<method>[A-Z]+) (?P<path>\S+) (?P<status>\d{3}) (?P<bytes>\d+) '
    r'(?P<agent>\S+)$'
)
RE_COMMON_VHOST = (
    r'^(?P<vhost>\S+) (?P<ip>\S+) \S+ \S+ \[(?:[^\]]+)\] '
    r'"(?P<method>\S+) (?P<path>\S+)[^"]*" (?P<status>\d{3}) (?P<bytes>\d+)$'
)
RE_COMMON = (
    r'^(?P<ip>\S+) \S+ \S+ \[(?:[^\]]+)\] '
    r'"(?P<method>\S+) (?P<path>\S+)[^"]*" (?P<status>\d{3}) (?P<bytes>\d+)$'
)
# icecast2: NCSA-extended plus a trailing listen-duration (seconds).
RE_ICECAST2 = (
    r'^(?P<ip>\S+) \S+ \S+ \[(?:[^\]]+)\] '
    r'"(?P<method>\S+) (?P<path>\S+)[^"]*" '
    r'(?P<status>\d{3}) (?P<bytes>\d+) '
    r'"(?P<referrer>[^"]*)" "(?P<agent>[^"]*)" (?:\d+)$'
)
# Amazon CloudFront web-distribution access log: tab-separated W3C dialect
# (date, time, edge, sc-bytes, c-ip, method, host, uri-stem, status,
# referrer, user-agent).
RE_CLOUDFRONT = (
    r'^(?:\d{4}-\d{2}-\d{2})\t(?:\d{2}:\d{2}:\d{2})\t(?:\S+)\t'
    r'(?P<bytes>\d+)\t(?P<ip>\S+)\t(?P<method>[A-Z]+)\t(?P<vhost>\S+)\t'
    r'(?P<path>\S+)\t(?P<status>\d{3})\t(?P<referrer>[^\t]*)\t(?P<agent>[^\t]*)$'
)
# AWS classic ELB access log: ISO ts, elb name, client:port, backend:port,
# three latencies, elb+backend status, received/sent bytes, quoted request,
# quoted UA, cipher, protocol.
# Leading timestamp constrained to start with a digit so the starts_digit
# premask in parse_batch is a provable NECESSARY condition of the match
# (real ELB timestamps are ISO-8601 and always digit-led).
RE_ELB = (
    r'^(?:\d\S*Z) (?:\S+) (?P<ip>[\d.]+):\d+ [\d.]+:\d+ '
    r'[\d.+-]+ [\d.+-]+ [\d.+-]+ (?P<status>\d{3}) \d{3} \d+ (?P<bytes>\d+) '
    r'"(?P<method>\S+) (?P<path>\S+)[^"]*" "(?P<agent>[^"]*)" \S+ \S+$'
)
# Amazon S3 server access log: owner, bucket, [time], ip, requester,
# request-id, operation, key, quoted request, status, error-code ('-'),
# bytes-sent, object-size, total-time, turnaround, quoted referrer,
# quoted UA, version-id.
RE_S3 = (
    r'^(?:\S+) (?P<vhost>\S+) \[(?:[^\]]+)\] (?P<ip>\S+) \S+ \S+ '
    r'(?:\S+) \S+ "(?P<method>\S+) (?P<path>\S+)[^"]*" '
    r'(?P<status>\d{3}) - (?P<bytes>\d+) \d+ \d+ \d+ '
    r'"(?P<referrer>[^"]*)" "(?P<agent>[^"]*)" \S+$'
)
# IIS W3C default fields: date time s-ip method uri-stem uri-query s-port
# username c-ip user-agent status substatus win32-status time-taken.
# No bytes column -> bytes stays null.
RE_IIS = (
    r'^(?:\d{4}-\d{2}-\d{2}) (?:\d{2}:\d{2}:\d{2}) (?:\S+) '
    r'(?P<method>[A-Z]+) (?P<path>\S+) \S+ \d+ \S+ (?P<ip>\S+) '
    r'(?P<agent>\S+) (?P<status>\d{3}) \d+ \d+ \d+$'
)

# shoutcast W3C dialect: c-ip c-dns date time uri-stem status user-agent
# sc-bytes x-duration avgbandwidth (no method field -> method stays null).
RE_SHOUTCAST = (
    r'^(?P<ip>[\d.]+) \S+ (?:\d{4}-\d{2}-\d{2}) (?:\d{2}:\d{2}:\d{2}) '
    r'(?P<path>\S+) (?P<status>\d{3}) (?P<agent>\S+) (?P<bytes>\d+) \d+ \d+$'
)

# common_complete: virtual host ahead of a full NCSA-extended line.
RE_COMMON_COMPLETE = (
    r'^(?P<vhost>\S+) (?P<ip>\S+) \S+ \S+ \[(?:[^\]]+)\] '
    r'"(?P<method>\S+) (?P<path>\S+)[^"]*" '
    r'(?P<status>\d{3}) (?P<bytes>\d+) '
    r'"(?P<referrer>[^"]*)" "(?P<agent>[^"]*)"$'
)

# (fmt name, pattern, fields present) — cascade order matters
# (first match wins; the formats are mutually exclusive by structure).
FORMATS = [
    ("ncsa_extended", RE_NCSA, ("ip", "method", "path", "status", "bytes", "referrer", "agent")),
    ("nginx_json", RE_NGINX_JSON, ("ip", "method", "path", "status", "bytes", "referrer", "agent")),
    ("w3c_extended", RE_W3C, ("ip", "method", "path", "status", "bytes", "agent")),
    ("icecast2", RE_ICECAST2, ("ip", "method", "path", "status", "bytes", "referrer", "agent")),
    ("amazon_cloudfront", RE_CLOUDFRONT, ("ip", "method", "path", "status", "bytes", "referrer", "agent", "vhost")),
    ("elb", RE_ELB, ("ip", "method", "path", "status", "bytes", "agent")),
    ("s3", RE_S3, ("ip", "method", "path", "status", "bytes", "referrer", "agent", "vhost")),
    ("iis", RE_IIS, ("ip", "method", "path", "status", "agent")),
    ("shoutcast", RE_SHOUTCAST, ("ip", "path", "status", "agent", "bytes")),
    ("common_complete", RE_COMMON_COMPLETE, ("vhost", "ip", "method", "path", "status", "bytes", "referrer", "agent")),
    ("common_vhost", RE_COMMON_VHOST, ("vhost", "ip", "method", "path", "status", "bytes")),
    ("common", RE_COMMON, ("ip", "method", "path", "status", "bytes")),
]

UNIFIED_FIELDS = ("ip", "method", "path", "status", "bytes", "referrer", "agent", "vhost")

# The log line's OWN timestamp (import_logs parses hit time for Matomo;
# our main patterns keep the time group non-capturing for the DuckDB
# group-index limit, so log-time extraction is its own small cascade).
# One (when-regex, strptime-format) per family; applied only to rows
# claimed by that family's formats.
TS_FAMILIES = [
    # bracketed NCSA clock (first [...] on the line)
    (
        ("ncsa_extended", "icecast2", "s3", "common_complete", "common_vhost", "common"),
        r"\[(?P<when>\d{2}/\w{3}/\d{4}:\d{2}:\d{2}:\d{2})",
        "%d/%b/%Y:%H:%M:%S",
    ),
    # ISO-8601 (nginx_json "time" field, elb leading timestamp)
    (
        ("nginx_json", "elb"),
        r"(?P<when>\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2})",
        "%Y-%m-%dT%H:%M:%S",
    ),
    # leading "date time" pair (w3c, iis)
    (
        ("w3c_extended", "iis"),
        r"^(?P<when>\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2})",
        "%Y-%m-%d %H:%M:%S",
    ),
    # shoutcast: date+time are tokens 3-4 (after ip and dns)
    (
        ("shoutcast",),
        r"^[\d.]+ \S+ (?P<when>\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2})",
        "%Y-%m-%d %H:%M:%S",
    ),
    # cloudfront: date<TAB>time
    (
        ("amazon_cloudfront",),
        r"^(?P<d>\d{4}-\d{2}-\d{2})\t(?P<t>\d{2}:\d{2}:\d{2})",
        "%Y-%m-%d %H:%M:%S",
    ),
]


def parse_batch(batch: pa.Table) -> pa.Table:
    """Append fmt / ip / method / path / http_status / bytes / referrer /
    user_agent columns extracted from ``text``. Zero-copy in, Arrow out.

    Perf: every format probes only rows not yet claimed AND passing a
    cheap structural premask that is a NECESSARY condition of its regex
    (so masking provably cannot change results): last-char class for the
    NCSA family (plain-NCSA ends on the agent quote, common/icecast on a
    digit), first-char class for the timestamp-led dialects (w3c / iis /
    elb start with a digit, nginx with '{'), tab presence for
    cloudfront. Without these, every NCSA-prefixed pattern scans almost
    to its ``$`` anchor on every sibling-format line. Masked rows become
    '' so the regex fails at offset 0.
    """
    text = pc.cast(batch["text"], pa.string())
    n = len(batch)
    fmt_col = pa.nulls(n, pa.string())
    claimed = pa.array([False] * n, pa.bool_())
    unified = {f: pa.nulls(n, pa.string()) for f in UNIFIED_FIELDS}

    ends_digit = pc.match_substring_regex(text, r"\d$")
    ends_quote = pc.ends_with(text, pattern='"')
    starts_digit = pc.match_substring_regex(text, r"^\d")
    premask = {
        "ncsa_extended": ends_quote,
        "nginx_json": pc.starts_with(text, pattern="{"),
        "w3c_extended": starts_digit,
        "icecast2": ends_digit,
        "amazon_cloudfront": pc.match_substring(text, "\t"),
        "elb": starts_digit,
        "s3": None,  # s3's final (version-id) token is unconstrained
        "iis": starts_digit,
        "shoutcast": pc.and_(starts_digit, ends_digit),
        "common_complete": ends_quote,
        "common_vhost": ends_digit,
        "common": ends_digit,
    }

    for fmt, pattern, fields in FORMATS:
        pm = premask.get(fmt)
        candidate = pc.invert(claimed) if pm is None else pc.and_not(pm, claimed)
        probe = pc.if_else(candidate, text, "")
        ext = pc.extract_regex(probe, pattern)
        if isinstance(ext, pa.ChunkedArray):
            ext = ext.combine_chunks()
        hit = pc.and_not(pc.is_valid(ext), claimed)
        fmt_col = pc.if_else(hit, fmt, fmt_col)
        for f in fields:
            unified[f] = pc.if_else(hit, ext.field(f), unified[f])
        claimed = pc.or_(claimed, hit)

    # log_ts: the hit's own clock, parsed per family over claimed rows
    log_ts = pa.nulls(n, pa.timestamp("us"))
    for fmts, when_re, strp_fmt in TS_FAMILIES:
        fam_mask = pc.is_in(fmt_col, value_set=pa.array(list(fmts), pa.string()))
        probe = pc.if_else(fam_mask, text, "")
        ext = pc.extract_regex(probe, when_re)
        if isinstance(ext, pa.ChunkedArray):
            ext = ext.combine_chunks()
        ok = pc.is_valid(ext)
        nfields = ext.type.num_fields
        if nfields == 1:
            when = ext.field(0)
        else:  # date + time captured separately (cloudfront's tab)
            when = pc.binary_join_element_wise(ext.field(0), ext.field(1), " ")
        parsed = pc.strptime(
            pc.if_else(ok, when, None), format=strp_fmt, unit="us", error_is_null=True
        )
        log_ts = pc.if_else(ok, parsed, log_ts)

    out = batch
    out = out.append_column("fmt", fmt_col)
    out = out.append_column("log_ts", log_ts)
    out = out.append_column("ip", unified["ip"])
    out = out.append_column("method", unified["method"])
    out = out.append_column("path", unified["path"])
    out = out.append_column(
        "http_status", pc.cast(unified["status"], pa.int32())
    )
    out = out.append_column("bytes", pc.cast(unified["bytes"], pa.int64()))
    out = out.append_column("referrer", unified["referrer"])
    out = out.append_column("user_agent", unified["agent"])
    out = out.append_column("vhost", unified["vhost"])
    return out
