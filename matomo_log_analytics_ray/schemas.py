"""Arrow schemas for every table flowing through the engine.

The transcripts schema is the authoritative input shape from
BASELINE.json `input_hint`; the manifest/metrics schemas are the
columnar analogs of the reference control tables
(/root/reference/models/declarative.py:9-63).
"""

import pyarrow as pa

# Primary input: one row per turn of a multi-turn agent transcript.
TRANSCRIPTS = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
        pa.field("role", pa.string()),
        pa.field("text", pa.large_string()),
        pa.field("tool", pa.string()),
        pa.field("ts", pa.timestamp("us")),
    ]
)

# Columns appended by the parse stage (struct-flattened).
PARSED_FIELDS = [
    ("fmt", pa.string()),        # detected log format or null
    ("ip", pa.string()),
    ("method", pa.string()),
    ("path", pa.string()),
    ("http_status", pa.int32()),
    ("bytes", pa.int64()),
    ("referrer", pa.string()),
    ("user_agent", pa.string()),
]

# Outcome taxonomy — analog of the six ignored_lines_* breakdowns in
# /root/reference/models/declarative.py:37-42 and the counters in
# /root/reference/libs/lib_summary.py:10-20. Every turn gets exactly one.
OUTCOMES = (
    "imported",
    "invalid",
    "filtered",
    "bot",
    "static",
    "http_error",
    "http_redirect",
)

# Partition lineage manifest — analog of control_log_file
# (/root/reference/models/declarative.py:9-21): one row per unit of work.
MANIFEST = pa.schema(
    [
        pa.field("partition_id", pa.string()),
        pa.field("path", pa.string()),
        pa.field("size", pa.int64()),
        pa.field("created_at", pa.int64()),  # file st_ctime, epoch seconds
                                             # (lib_database.py:79-80)
        pa.field("server", pa.string()),     # routing key extracted from path
        pa.field("date", pa.string()),       # normalized %Y-%m-%d or ''
        pa.field("name", pa.string()),       # server-date
        pa.field("status", pa.int8()),
        pa.field("collection", pa.string()),
    ]
)

# Per-partition metrics — analog of control_log_file_summary
# (/root/reference/models/declarative.py:24-45).
PARTITION_METRICS = pa.schema(
    [
        pa.field("partition_id", pa.string()),
        pa.field("attempt", pa.int32()),
        pa.field("rows", pa.int64()),
        pa.field("bytes", pa.int64()),
        pa.field("parse_failures", pa.int64()),
        pa.field("n_imported", pa.int64()),
        pa.field("n_invalid", pa.int64()),
        pa.field("n_filtered", pa.int64()),
        pa.field("n_bot", pa.int64()),
        pa.field("n_static", pa.int64()),
        pa.field("n_http_error", pa.int64()),
        pa.field("n_http_redirect", pa.int64()),
        pa.field("wall_s", pa.float64()),
        pa.field("status", pa.int8()),
    ]
)
