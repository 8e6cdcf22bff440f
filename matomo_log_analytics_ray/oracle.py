"""DuckDB oracle-SQL builders.

Every SQL string here is generated from the SAME RE2 pattern constants
and lookup tables the Ray stages execute (stages/parse.py,
stages/classify.py, stages/enrich.py), so the oracle and the engine
provably apply identical extraction/classification/routing semantics.
Used both by the pytest golden tests and by __ray_entry__.oracle_sql().
"""

from __future__ import annotations

from .stages import classify, enrich, parse

import re as _re

# format -> field -> RE2 group number, computed from the very pattern
# strings the Ray kernel executes (named groups count in order; fields
# the kernel doesn't need are non-capturing so every index stays within
# DuckDB's regexp_extract limit of 9).
_GROUP_INDEX = {
    fmt: {name: i + 1 for i, name in enumerate(_re.findall(r"\(\?P<(\w+)>", pattern))}
    for fmt, pattern, _ in parse.FORMATS
}
_PATTERNS = {fmt: pattern for fmt, pattern, _ in parse.FORMATS}


def _field_sql(field: str, cast: str | None = None) -> str:
    branches = []
    for fmt, _, fields in parse.FORMATS:
        if field not in _GROUP_INDEX[fmt]:
            continue
        expr = f"regexp_extract(text, '{_PATTERNS[fmt]}', {_GROUP_INDEX[fmt][field]})"
        if cast:
            expr = f"CAST({expr} AS {cast})"
        branches.append(f"WHEN fmt = '{fmt}' THEN {expr}")
    return "CASE " + " ".join(branches) + " END"


def log_ts_sql(source_sql: str) -> str:
    """The hit's own clock (parse.TS_FAMILIES) as a '%Y-%m-%d %H:%M:%S'
    string per turn, generated from the same when-regexes and strptime
    formats the Ray kernel applies; '' when the line carries no parseable
    time (fmt null)."""
    branches = []
    for fmts, when_re, strp in parse.TS_FAMILIES:
        ngroups = when_re.count("(?P<")
        if ngroups == 1:
            when = f"regexp_extract(text, '{when_re}', 1)"
        else:
            when = (
                f"regexp_extract(text, '{when_re}', 1) || ' ' || "
                f"regexp_extract(text, '{when_re}', 2)"
            )
        fmt_list = ", ".join(f"'{f}'" for f in fmts)
        branches.append(
            f"WHEN fmt IN ({fmt_list}) THEN "
            f"COALESCE(strftime(try_strptime({when}, '{strp}'), '%Y-%m-%d %H:%M:%S'), '')"
        )
    ts_case = "CASE " + " ".join(branches) + " ELSE '' END"
    return (
        parsed_cte(source_sql)
        + f"""
SELECT conv_id, turn_idx, COALESCE(fmt, 'none') AS fmt, {ts_case} AS log_ts
FROM enriched"""
    )


def parsed_cte(source_sql: str) -> str:
    """CTE chain src -> parsed -> classified -> enriched over any
    source relation with transcripts columns."""
    fmt_case = "CASE " + " ".join(
        f"WHEN regexp_matches(text, '{pattern}') THEN '{fmt}'"
        for fmt, pattern, _ in parse.FORMATS
    ) + " END"

    filtered_pred = " OR ".join(
        f"path LIKE '{p}%'" for p in classify.EXCLUDED_PREFIXES
    )
    outcome_case = f"""CASE
        WHEN fmt IS NULL THEN 'invalid'
        WHEN {filtered_pred} THEN 'filtered'
        WHEN regexp_matches(path, '{classify.RE_STATIC_PATH}') THEN 'static'
        WHEN regexp_matches(user_agent, '{classify.RE_BOT_AGENT}') THEN 'bot'
        WHEN http_status >= 300 AND http_status < 400 THEN 'http_redirect'
        WHEN http_status >= 400 THEN 'http_error'
        ELSE 'imported' END"""

    tool_branches = " ".join(
        f"WHEN tool = '{t}' THEN '{s}'" for t, s in enrich.DEFAULT_TOOL_SINKS.items()
    )
    sink_case = f"""CASE {tool_branches}
        WHEN role = 'system' THEN 'system'
        ELSE 'site-' || CAST(CAST(regexp_extract(conv_id, '([0-9]+)', 1) AS BIGINT)
                             % {enrich.NUM_SITE_SHARDS} AS VARCHAR) END"""

    return f"""
WITH src AS ({source_sql}),
parsed AS (
    SELECT *, {fmt_case} AS fmt FROM src
),
fields AS (
    SELECT *,
        {_field_sql("path")} AS path,
        {_field_sql("status", "INTEGER")} AS http_status,
        {_field_sql("bytes", "BIGINT")} AS bytes,
        {_field_sql("agent")} AS user_agent
    FROM parsed
),
classified AS (
    SELECT *, {outcome_case} AS outcome FROM fields
),
enriched AS (
    SELECT *, {sink_case} AS sink FROM classified
)"""


def sink_outcome_counts_sql(source_sql: str) -> str:
    return (
        parsed_cte(source_sql)
        + """
SELECT sink, outcome, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(COALESCE(bytes, 0)) AS BIGINT) AS total_bytes
FROM enriched GROUP BY sink, outcome"""
    )


def sink_hourly_sql(source_sql: str) -> str:
    """Per-(sink, hour-of-log_ts) imported-hit counts — the Matomo-like
    per-site time series, keyed on the line's OWN clock (log_ts), not
    the transcript ts."""
    branches = []
    for fmts, when_re, strp in parse.TS_FAMILIES:
        ngroups = when_re.count("(?P<")
        if ngroups == 1:
            when = f"regexp_extract(text, '{when_re}', 1)"
        else:
            when = (
                f"regexp_extract(text, '{when_re}', 1) || ' ' || "
                f"regexp_extract(text, '{when_re}', 2)"
            )
        fmt_list = ", ".join(f"'{f}'" for f in fmts)
        branches.append(f"WHEN fmt IN ({fmt_list}) THEN try_strptime({when}, '{strp}')")
    ts_case = "CASE " + " ".join(branches) + " END"
    return (
        parsed_cte(source_sql)
        + f"""
SELECT sink, strftime(date_trunc('hour', {ts_case}), '%Y-%m-%d %H:00:00') AS hour,
       CAST(COUNT(*) AS BIGINT) AS n
FROM enriched WHERE outcome = 'imported'
GROUP BY sink, hour"""
    )


def routed_rows_sql(source_sql: str, sink: str) -> str:
    """Routed rows of one sink under stable (conv_id, turn_idx) order —
    the per-turn text-equality contract (BASELINE.json input_hint)."""
    return (
        parsed_cte(source_sql)
        + f"""
SELECT conv_id, turn_idx, role, text, outcome
FROM enriched WHERE sink = '{sink}'
ORDER BY conv_id, turn_idx"""
    )


def enriched_rows_sql(source_sql: str) -> str:
    return (
        parsed_cte(source_sql)
        + """
SELECT conv_id, turn_idx, fmt, path, http_status, outcome, sink
FROM enriched ORDER BY conv_id, turn_idx"""
    )


def global_counters_sql(source_sql: str) -> str:
    """The reference's Statistics counter vector
    (/root/reference/libs/lib_summary.py:10-20) as one aggregate row."""

    def cnt(outcome: str) -> str:
        return f"SUM(CASE WHEN outcome = '{outcome}' THEN 1 ELSE 0 END)"

    return (
        parsed_cte(source_sql)
        + f"""
SELECT
    CAST(COUNT(*) AS BIGINT) AS lines_parsed,
    CAST({cnt("imported")} AS BIGINT) AS requests_imported_successfully,
    CAST(COUNT(*) - {cnt("imported")} AS BIGINT) AS requests_ignored,
    CAST({cnt("filtered")} AS BIGINT) AS filtered_log_lines,
    CAST({cnt("http_error")} AS BIGINT) AS http_errors,
    CAST({cnt("http_redirect")} AS BIGINT) AS http_redirects,
    CAST({cnt("invalid")} AS BIGINT) AS invalid_log_lines,
    CAST({cnt("bot")} AS BIGINT) AS requests_done_by_bots,
    CAST({cnt("static")} AS BIGINT) AS requests_to_static_resources
FROM enriched"""
    )


def format_counts_sql(source_sql: str) -> str:
    return (
        parsed_cte(source_sql)
        + """
SELECT COALESCE(fmt, 'none') AS fmt, CAST(COUNT(*) AS BIGINT) AS n
FROM enriched GROUP BY 1"""
    )


def _date_expr() -> str:
    from .control import rules

    return (
        "COALESCE("
        f"strftime(try_strptime(NULLIF(regexp_extract(path, '{rules.RE_DATE_HYPHEN}', 0), ''), '%Y-%m-%d'), '%Y-%m-%d'), "
        f"strftime(try_strptime(NULLIF(regexp_extract(path, '{rules.RE_DATE_COMPACT}', 0), ''), '%Y%m%d'), '%Y-%m-%d'), "
        "'')"
    )


def server_extract_sql(log_paths_parquet: str) -> str:
    """Routing-key extraction for the scl and nbr rule sets (M1/M2/M6)
    as CASE cascades generated from the same rule tables."""
    from .control import rules

    nbr_branches = " ".join(
        f"WHEN path LIKE '%{pat}%' THEN '{srv}'" for pat, srv in rules.NBR_PATTERNS
    )
    return f"""
SELECT collection, path,
    CASE WHEN path LIKE '%node03%' THEN 'node03'
         WHEN path LIKE '%hiperion%' AND path LIKE '%apache%' THEN 'hiperion-apache'
         WHEN path LIKE '%hiperion%' AND path LIKE '%varnish%' THEN 'hiperion-varnish'
         ELSE '' END AS server_scl,
    CASE {nbr_branches} ELSE '' END AS server_nbr
FROM read_parquet('{log_paths_parquet}')"""


def scl_discovery_sql(log_paths_parquet: str) -> str:
    """Full discovery derivation for collection='scl' rows: server, date
    and the presence/validity status routing (F1/F2 semantics:
    REJECTED=-99 when underivable, INVALID=-9 on the anonymous-IP rules
    after 2020-04-29, else QUEUE=0). ISO date strings compare correctly
    as strings."""
    from .control import rules

    return f"""
WITH d AS (
    SELECT path, size, created_at,
        CASE WHEN path LIKE '%node03%' THEN 'node03'
             WHEN path LIKE '%hiperion%' AND path LIKE '%apache%' THEN 'hiperion-apache'
             WHEN path LIKE '%hiperion%' AND path LIKE '%varnish%' THEN 'hiperion-varnish'
             ELSE '' END AS server,
        {_date_expr()} AS log_date
    FROM read_parquet('{log_paths_parquet}')
    WHERE collection = 'scl'
)
SELECT path, server, log_date,
    CASE WHEN server = '' OR log_date = '' THEN -99
         WHEN (path LIKE '%varnishncsa%' AND log_date > '{rules.SCL_ANON_IP_CUTOFF}')
           OR (server = 'hiperion-apache' AND log_date > '{rules.SCL_ANON_IP_CUTOFF}')
         THEN -9
         ELSE 0 END AS status,
    size, created_at
FROM d"""


def _summary_counter_expr(attr: str) -> str:
    """Greedy-dotall regex taking the LAST line carrying the counter
    label followed by a number (equals the engine's reversed scan on
    the constructed fixture)."""
    label = attr.replace("_", " ")
    return (
        f"COALESCE(CAST(regexp_extract(lower(text), "
        f"'(?s).*\\n[^\\n0-9]*([0-9]+)[^\\n]*{label}', 1) AS BIGINT), 0)"
    )


def summary_counters_sql(summaries_parquet: str) -> str:
    """M12 oracle: per-counter greedy-dotall regex takes the LAST line
    carrying the label followed by a number on the same line — the
    fixture is constructed so this equals the engine's reversed
    overwrite-until-filled scan (see datagen.generate_summaries)."""
    from .control import summary as summod

    cols = [f"{_summary_counter_expr(attr)} AS {attr}" for attr in summod.COUNTER_ATTRS]
    time_expr = (
        "COALESCE(CAST(regexp_extract(lower(text), "
        "'(?s).*total time[^\\n0-9]*([0-9]+)', 1) AS BIGINT), 0)"
    )
    cols.append(f"{time_expr} AS total_time")
    return (
        f"SELECT summary_id, {', '.join(cols)} "
        f"FROM read_parquet('{summaries_parquet}')"
    )


def a5_status_resolution_sql(summaries_parquet: str) -> str:
    """A5 oracle: the tolerant status / lines_parsed resolution
    (reference libs/lib_summary.py:56-91, control/summary.py:77-105) as
    a SQL CASE chain — the +-1 tolerance window on imported+ignored, the
    'lines parsed' 4-integer fallback line, the RETRY_DIFF_LINES safety
    subtraction on partial retries, and the FAILED sink. The fixture
    carries at most one 'lines parsed' line per doc, so an unanchored
    first-match extraction equals the engine's reversed last-match scan."""
    from .control import summary as summod

    retry = summod.RETRY_DIFF_LINES
    win = "BETWEEN expected_lines - 1 AND expected_lines + 1"
    return f"""
WITH base AS (
    SELECT summary_id, expected_lines,
        {_summary_counter_expr("requests_imported_successfully")} AS imported,
        {_summary_counter_expr("requests_ignored")} AS ignored,
        COALESCE(regexp_extract(lower(text), '\\n([^\\n]*lines parsed[^\\n]*)', 1), '') AS lp_line
    FROM read_parquet('{summaries_parquet}')
), d AS (
    SELECT summary_id, expected_lines, imported + ignored AS total, lp_line,
        len(regexp_extract_all(lp_line, '[0-9]+')) AS n_nums,
        COALESCE(CAST(NULLIF(regexp_extract(lp_line, '([0-9]+)', 1), '') AS BIGINT), 0) AS parsed
    FROM base
)
SELECT summary_id,
    CAST(CASE WHEN total {win} THEN 2
              WHEN lp_line = '' THEN 0
              WHEN n_nums <> 4 THEN -1
              WHEN parsed {win} THEN 2
              WHEN parsed - {retry} > 0 THEN 1
              ELSE -1 END AS BIGINT) AS status,
    CAST(CASE WHEN total {win} THEN total
              WHEN lp_line = '' THEN 0
              WHEN n_nums <> 4 THEN 0
              WHEN parsed {win} THEN parsed
              WHEN parsed - {retry} > 0 THEN parsed - {retry}
              ELSE 0 END AS BIGINT) AS lines_parsed,
    CAST(total AS BIGINT) AS sum_imported_ignored_lines
FROM d"""


def generic_server_extract_sql(
    log_paths_parquet: str, collections: tuple = ("arg", "esp", "cub")
) -> str:
    """M5 generic-collection ("ratchet") routing oracle, generated from
    the SAME broadcast tables the kernel uses: substring containment
    (contains(), not LIKE — patterns hold '_' which LIKE would treat as
    a wildcard), collection-prefix post-filter, exactly-one filename hit
    wins, zero filename hits fall through to the dir table, >1 hit
    anywhere is ambiguous -> '' (reference lib_file_name.py:48-70)."""
    from .control import rules

    base = "regexp_extract(path, '([^/]+)$', 1)"
    parts = []
    for coll in collections:
        fn = [
            (pat, prefix + num)
            for pat, (prefix, num) in rules.FILENAME_PATTERN_TO_SERVER.items()
            if coll in prefix
        ]
        dr = [
            (pat, prefix + num)
            for pat, (prefix, num) in rules.DIR_PATTERN_TO_SERVER.items()
            if coll in prefix
        ]

        def count_expr(entries, hay):
            if not entries:
                return "0"
            return " + ".join(
                f"CASE WHEN contains({hay}, '{pat}') THEN 1 ELSE 0 END"
                for pat, _ in entries
            )

        def pick_expr(entries, hay):
            if not entries:
                return "''"
            branches = " ".join(
                f"WHEN contains({hay}, '{pat}') THEN '{srv}'" for pat, srv in entries
            )
            return f"CASE {branches} ELSE '' END"

        server = (
            f"CASE WHEN ({count_expr(fn, base)}) = 1 THEN {pick_expr(fn, base)} "
            f"WHEN ({count_expr(fn, base)}) = 0 AND ({count_expr(dr, 'path')}) = 1 "
            f"THEN {pick_expr(dr, 'path')} ELSE '' END"
        )
        parts.append(
            f"SELECT collection, path, {server} AS server "
            f"FROM read_parquet('{log_paths_parquet}') WHERE collection = '{coll}'"
        )
    return " UNION ALL ".join(parts)


def ven_server_extract_sql(log_paths_parquet: str) -> str:
    """M7 Venezuela routing oracle: the same ordered condition cascade
    as routing._rule_ven (np.select — first true wins — mirrored as a
    SQL CASE), with the three RE_VEN_* regexes interpolated verbatim
    from control/rules.py (reference lib_file_name.py:88-117)."""
    from .control import rules

    base = "regexp_extract(path, '([^/]+)$', 1)"

    def c(s: str) -> str:
        return f"contains(path, '{s}')"

    def cn(s: str) -> str:
        return f"contains({base}, '{s}')"

    sd = f"regexp_matches({base}, '{rules.RE_VEN_STARTS_WITH_DATE}')"
    ed = f"regexp_matches({base}, '{rules.RE_VEN_ENDS_WITH_DATE}')"
    edc = f"regexp_matches({base}, '{rules.RE_VEN_ENDS_WITH_DATE_NO_HYPHEN}')"
    apache, c01, c02 = c("apache"), c("centos-2gb-nyc3-01"), c("centos-2gb-nyc3-02")
    cascade = [
        (f"{apache} AND {c01} AND {sd}", "ven1"),
        (f"{apache} AND {c01} AND {ed}", "ven3"),
        (f"{apache} AND {c01} AND {edc}", "ven4"),
        (f"{apache} AND {c01}", ""),
        (f"{apache} AND {c02} AND {c('scielo-org-ve')} AND {ed}", "ven5"),
        (f"{apache} AND {c02} AND {c('scielo-org-ve')}", ""),
        (f"{apache} AND {c02} AND {c('varnish-aws')}", "ven6"),
        (f"{apache} AND {c02}", ""),
        (f"{apache} AND {cn('ve-scielo-org-access')} AND {sd}", "ven1"),
        (f"{apache} AND {cn('ve-scielo-org-access')}", ""),
        (f"{apache} AND {cn('ve-scielo-org')} AND {sd}", "ven2"),
        (apache, ""),
        (c("logs-ha"), "ven7"),
    ]
    case = (
        "CASE "
        + " ".join(f"WHEN {cond} THEN '{srv}'" for cond, srv in cascade)
        + " ELSE '' END"
    )
    return (
        f"SELECT path, {case} AS server "
        f"FROM read_parquet('{log_paths_parquet}') WHERE collection = 'ven'"
    )


def dat_pre_server_extract_sql(log_paths_parquet: str) -> str:
    """M3/M4 routing oracle: the dataverse and preprints rule cascades
    (routing._rule_dat / _rule_pre; reference libs/lib_file_name.py:34-45)
    as SQL CASEs over path and basename, evaluated over EVERY fixture
    path (like server_extract_sql: the dispatch itself is exercised by
    routing_server_extract; this gate pins the two rules' outputs)."""
    base = "regexp_extract(path, '([^/]+)$', 1)"
    dat = (
        "CASE WHEN contains(path, 'dataverse') AND "
        f"contains({base}, 'data.scielo') THEN 'data2' "
        "WHEN contains(path, 'dataverse') THEN 'data1' ELSE '' END"
    )
    pre = (
        "CASE WHEN contains(path, 'preprints') AND "
        f"contains({base}, 'preprints') THEN 'preprints' ELSE '' END"
    )
    return (
        f"SELECT collection, path, {dat} AS server_dat, {pre} AS server_pre "
        f"FROM read_parquet('{log_paths_parquet}')"
    )


def s3_summary_read_sql(files_glob: str, expected_parquet: str) -> str:
    """S3 oracle: the whole-file summary reader
    (control/summary.read_and_parse_summaries, reference
    libs/lib_summary.py:114-119) replayed over the SAME bytes via
    DuckDB read_text — counter extraction (the m12 greedy-last regex),
    total_time, and the full A5 status / lines_parsed resolution keyed
    by file basename joined to the expected-lines table."""
    from .control import summary as summod

    cols = [
        f"{_summary_counter_expr(attr)} AS {attr}"
        for attr in summod.COUNTER_ATTRS
    ]
    time_expr = (
        "COALESCE(CAST(regexp_extract(lower(text), "
        "'(?s).*total time[^\\n0-9]*([0-9]+)', 1) AS BIGINT), 0)"
    )
    retry = summod.RETRY_DIFF_LINES
    win = "BETWEEN expected_lines - 1 AND expected_lines + 1"
    return f"""
WITH files AS (
    SELECT regexp_extract(filename, '([^/]+)$', 1) AS summary_id,
        content AS text
    FROM read_text('{files_glob}')
), j AS (
    SELECT f.summary_id, f.text, e.expected_lines
    FROM files f JOIN read_parquet('{expected_parquet}') e USING (summary_id)
), base AS (
    SELECT summary_id, expected_lines, {', '.join(cols)},
        {time_expr} AS total_time,
        COALESCE(regexp_extract(lower(text), '\\n([^\\n]*lines parsed[^\\n]*)', 1), '') AS lp_line
    FROM j
), d AS (
    SELECT * EXCLUDE (lp_line),
        requests_imported_successfully + requests_ignored AS total,
        len(regexp_extract_all(lp_line, '[0-9]+')) AS n_nums,
        COALESCE(CAST(NULLIF(regexp_extract(lp_line, '([0-9]+)', 1), '') AS BIGINT), 0) AS parsed,
        lp_line
    FROM base
)
SELECT * EXCLUDE (expected_lines, total, n_nums, parsed, lp_line),
    CAST(CASE WHEN total {win} THEN 2
              WHEN lp_line = '' THEN 0
              WHEN n_nums <> 4 THEN -1
              WHEN parsed {win} THEN 2
              WHEN parsed - {retry} > 0 THEN 1
              ELSE -1 END AS BIGINT) AS status,
    CAST(CASE WHEN total {win} THEN total
              WHEN lp_line = '' THEN 0
              WHEN n_nums <> 4 THEN 0
              WHEN parsed {win} THEN parsed
              WHEN parsed - {retry} > 0 THEN parsed - {retry}
              ELSE 0 END AS BIGINT) AS lines_parsed,
    CAST(total AS BIGINT) AS sum_imported_ignored_lines
FROM d"""


def scl_date_status_sql(log_paths_parquet: str) -> str:
    """A1/A2 oracle: scl discovery -> mark valid files LOADED -> per-date
    completeness via the piecewise expected-count table (generated from
    the same rules.DAILY_EXPECTED_PIECEWISE rows the kernel uses)."""
    from .control import rules

    rows = rules.DAILY_EXPECTED_PIECEWISE["scl"]
    branches = " ".join(
        f"WHEN log_date > '{cutoff}' THEN {n}" for cutoff, n in rows if cutoff is not None
    )
    fallback = next(n for cutoff, n in rows if cutoff is None)
    expected_case = f"CASE {branches} ELSE {fallback} END"
    inner = scl_discovery_sql(log_paths_parquet)
    return f"""
WITH disc AS ({inner}),
loaded AS (
    SELECT log_date,
           COUNT(*) FILTER (WHERE status = 0) AS n_loaded
    FROM disc WHERE log_date <> '' GROUP BY log_date
)
SELECT 'scl' AS collection, log_date AS date,
       CAST(CASE WHEN n_loaded = expected THEN 2
                 WHEN n_loaded > 0 AND n_loaded < expected THEN 1
                 ELSE 0 END AS BIGINT) AS status
FROM (SELECT log_date, n_loaded, {expected_case} AS expected FROM loaded)
ORDER BY collection, date"""


def date_extract_sql(log_paths_parquet: str) -> str:
    """M8 date extraction: first-match-per-format + strict calendar
    validation, hyphenated format first (control/dates.py semantics)."""
    from .control import rules

    return f"""
SELECT collection, path,
    COALESCE(
        strftime(try_strptime(NULLIF(regexp_extract(path, '{rules.RE_DATE_HYPHEN}', 0), ''), '%Y-%m-%d'), '%Y-%m-%d'),
        strftime(try_strptime(NULLIF(regexp_extract(path, '{rules.RE_DATE_COMPACT}', 0), ''), '%Y%m%d'), '%Y-%m-%d'),
        '') AS log_date
FROM read_parquet('{log_paths_parquet}')"""


def rawlog_format_counts_sql(log_path: str) -> str:
    """S6 raw-text source oracle: split the plain .log file into lines
    and classify with the SAME format cascade the engine applies to the
    gzip twin through ray.data.read_text."""
    from .stages import parse

    fmt_case = "CASE " + " ".join(
        f"WHEN regexp_matches(text, '{pattern}') THEN '{fmt}'"
        for fmt, pattern, _ in parse.FORMATS
    ) + " END"
    return f"""
WITH lines AS (
    SELECT unnest(string_split(content, chr(10))) AS text
    FROM read_text('{log_path}')
), src AS (SELECT text FROM lines WHERE text <> '')
SELECT COALESCE({fmt_case}, 'none') AS fmt, CAST(COUNT(*) AS BIGINT) AS n
FROM src GROUP BY 1"""


def simhash_verified_pairs_sql(fp_parquet: str, max_hamming: int = 3) -> str:
    """All document pairs at Hamming <= max_hamming over the cached
    fingerprint table (datagen.simhash_path) — the 4x16-bit chunk
    theorem makes the engine's candidates+verify output exactly this
    set."""
    d = "bit_count(xor(a.simhash, b.simhash))"
    return f"""
SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST({d} AS BIGINT) AS hamming
FROM read_parquet('{fp_parquet}') a JOIN read_parquet('{fp_parquet}') b
  ON a.doc_id < b.doc_id
WHERE {d} <= {max_hamming}"""


def jaccard_verified_pairs_sql(threshold: float = 0.8, k: int = 3) -> str:
    """All document pairs with exact k-gram Jaccard >= threshold over
    the ``documents`` view: tokens are the SAME [a-z0-9]+ lowercased
    words the engine hashes (ops/hashing.tokenize_words); docs shorter
    than k fall back to their word set exactly like shingle_hashes."""
    gram = " || ' ' || ".join(f"w[i+{j}]" for j in range(k)).replace("w[i+0]", "w[i]")
    return f"""
WITH t AS (
    SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w FROM documents
), s AS (
    SELECT doc_id,
        CASE WHEN len(w) >= {k}
             THEN list_distinct(list_transform(range(1, len(w) - {k - 2}), i -> {gram}))
             ELSE list_distinct(w) END AS sh
    FROM t
), shingle_rows AS (
    SELECT doc_id, unnest(sh) AS g FROM s
), olap AS (
    -- exact set-similarity join: only pairs sharing >= 1 distinct
    -- shingle can reach any threshold > 0, so the inverted-index
    -- self-join + count replaces the all-pairs list_intersect scan
    -- (identical result, ~50x faster on the driver's gate corpus)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
    FROM shingle_rows a JOIN shingle_rows b
      ON a.g = b.g AND a.doc_id < b.doc_id
    GROUP BY 1, 2
), slen AS (
    SELECT doc_id, len(sh) AS n_sh FROM s
), p AS (
    SELECT o.id_a, o.id_b, o.inter, la.n_sh + lb.n_sh - o.inter AS uni
    FROM olap o
    JOIN slen la ON la.doc_id = o.id_a
    JOIN slen lb ON lb.doc_id = o.id_b
)
SELECT id_a, id_b, ROUND(CAST(inter AS DOUBLE) / uni, 6) AS jaccard
FROM p WHERE uni > 0 AND CAST(inter AS DOUBLE) / uni >= {threshold}"""


def _jaccard_pairs_ctes(threshold: float = 0.8, k: int = 3) -> str:
    """The jaccard_verified_pairs_sql body reshaped as named CTEs
    (t, s, p, vp) for composition under WITH RECURSIVE."""
    gram = " || ' ' || ".join(f"w[i+{j}]" for j in range(k)).replace("w[i+0]", "w[i]")
    return f"""t AS (
    SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w FROM documents
), s AS (
    SELECT doc_id,
        CASE WHEN len(w) >= {k}
             THEN list_distinct(list_transform(range(1, len(w) - {k - 2}), i -> {gram}))
             ELSE list_distinct(w) END AS sh
    FROM t
), shingle_rows AS (
    SELECT doc_id, unnest(sh) AS g FROM s
), olap AS (
    -- inverted-index set-similarity join (see jaccard_verified_pairs_sql)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
    FROM shingle_rows a JOIN shingle_rows b
      ON a.g = b.g AND a.doc_id < b.doc_id
    GROUP BY 1, 2
), slen AS (
    SELECT doc_id, len(sh) AS n_sh FROM s
), p AS (
    SELECT o.id_a, o.id_b, o.inter, la.n_sh + lb.n_sh - o.inter AS uni
    FROM olap o
    JOIN slen la ON la.doc_id = o.id_a
    JOIN slen lb ON lb.doc_id = o.id_b
), vp AS (
    SELECT id_a, id_b FROM p
    WHERE uni > 0 AND CAST(inter AS DOUBLE) / uni >= {threshold}
)"""


def embedding_clusters_sql(threshold: float = 0.4) -> str:
    """Connected components over the exact cosine near-dup pairs of the
    ``embeddings`` view (recursive-CTE min-reach)."""
    return f"""
WITH RECURSIVE vp AS (
    SELECT a.vec_id AS id_a, b.vec_id AS id_b
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.embedding, b.embedding) >= {threshold}
), e AS (
    SELECT id_a AS u, id_b AS v FROM vp
    UNION SELECT id_b, id_a FROM vp
), reach(u, r) AS (
    SELECT u, u FROM (SELECT DISTINCT u FROM e)
    UNION
    SELECT e.u, reach.r FROM e JOIN reach ON e.v = reach.u
)
SELECT u AS node, min(r) AS cluster_id FROM reach GROUP BY u"""


def leakage_safe_split_sql(threshold: float = 0.8, k: int = 3) -> str:
    """Cluster-aware split replay: near-dup components (recursive CTE
    over exact-Jaccard pairs), cluster_id = component min (self for
    unpaired docs), then the knuth-bucket split thresholds applied to
    the CLUSTER id."""
    return f"""
WITH RECURSIVE {_jaccard_pairs_ctes(threshold, k)},
e AS (
    SELECT id_a AS u, id_b AS v FROM vp
    UNION SELECT id_b, id_a FROM vp
),
reach(u, r) AS (
    SELECT u, u FROM (SELECT DISTINCT u FROM e)
    UNION
    SELECT e.u, reach.r FROM e JOIN reach ON e.v = reach.u
),
cc AS (SELECT u AS node, min(r) AS cluster_id FROM reach GROUP BY u),
assigned AS (
    SELECT d.doc_id, COALESCE(cc.cluster_id, d.doc_id) AS cluster_id
    FROM documents d LEFT JOIN cc ON cc.node = d.doc_id
)
SELECT doc_id, cluster_id,
    CASE WHEN b < 800 THEN 'train' WHEN b < 900 THEN 'val' ELSE 'test' END AS split
FROM (
    SELECT doc_id, cluster_id,
        ((cluster_id * 2654435761) % 4294967296) % 1000 AS b
    FROM assigned
)"""


def decontaminate_sql(k: int = 3, bench_source: str = "src3") -> str:
    """Per training doc (source != bench_source): count of its distinct
    k-gram shingles occurring anywhere in the benchmark split, plus the
    contaminated flag — same gram construction as the Jaccard oracle
    (short docs fall back to their word set)."""
    gram = " || ' ' || ".join(f"w[i+{j}]" for j in range(k)).replace("w[i+0]", "w[i]")
    return f"""
WITH t AS (
    SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w FROM documents
), s AS (
    SELECT doc_id,
        CASE WHEN len(w) >= {k}
             THEN list_distinct(list_transform(range(1, len(w) - {k - 2}), i -> {gram}))
             ELSE list_distinct(w) END AS sh
    FROM t
), bench AS (
    SELECT DISTINCT unnest(s.sh) AS g
    FROM s JOIN documents d USING (doc_id) WHERE d.source = '{bench_source}'
), tr AS (
    SELECT s.doc_id, unnest(s.sh) AS g
    FROM s JOIN documents d USING (doc_id) WHERE d.source <> '{bench_source}'
), ov AS (
    SELECT doc_id, count(*) AS n_overlap FROM tr
    WHERE g IN (SELECT g FROM bench) GROUP BY doc_id
)
SELECT d.doc_id, COALESCE(ov.n_overlap, 0) AS n_overlap,
       COALESCE(ov.n_overlap, 0) > 0 AS contaminated
FROM documents d LEFT JOIN ov USING (doc_id)
WHERE d.source <> '{bench_source}'"""


def dedup_clusters_sql(threshold: float = 0.8, k: int = 3) -> str:
    """Connected components over the exact-Jaccard verified pairs: for
    every node in a pair, the minimum doc_id reachable through pair
    edges (DuckDB recursive CTE replaying ops/cluster min-label
    propagation)."""
    return f"""
WITH RECURSIVE {_jaccard_pairs_ctes(threshold, k)},
e AS (
    SELECT id_a AS u, id_b AS v FROM vp
    UNION SELECT id_b, id_a FROM vp
),
reach(u, r) AS (
    SELECT u, u FROM (SELECT DISTINCT u FROM e)
    UNION
    SELECT e.u, reach.r FROM e JOIN reach ON e.v = reach.u
)
SELECT u AS node, min(r) AS cluster_id FROM reach GROUP BY u"""


def dedup_keep_canonical_sql(threshold: float = 0.8, k: int = 3) -> str:
    """Doc ids surviving duplicate clustering: the minimum id of each
    duplicate cluster plus every unpaired doc."""
    return f"""
WITH RECURSIVE {_jaccard_pairs_ctes(threshold, k)},
e AS (
    SELECT id_a AS u, id_b AS v FROM vp
    UNION SELECT id_b, id_a FROM vp
),
reach(u, r) AS (
    SELECT u, u FROM (SELECT DISTINCT u FROM e)
    UNION
    SELECT e.u, reach.r FROM e JOIN reach ON e.v = reach.u
),
cc AS (SELECT u AS node, min(r) AS cluster_id FROM reach GROUP BY u)
SELECT d.doc_id FROM documents d
WHERE d.doc_id NOT IN (SELECT node FROM cc WHERE cluster_id < node)"""


def dedup_keep_best_sql(
    priority_col: str = "n_chars", threshold: float = 0.8, k: int = 3
) -> str:
    """Doc ids surviving duplicate clustering under the keep-BEST
    policy: per cluster the max-priority member (ties by min id), plus
    every unpaired doc."""
    return f"""
WITH RECURSIVE {_jaccard_pairs_ctes(threshold, k)},
e AS (
    SELECT id_a AS u, id_b AS v FROM vp
    UNION SELECT id_b, id_a FROM vp
),
reach(u, r) AS (
    SELECT u, u FROM (SELECT DISTINCT u FROM e)
    UNION
    SELECT e.u, reach.r FROM e JOIN reach ON e.v = reach.u
),
cc AS (SELECT u AS node, min(r) AS cluster_id FROM reach GROUP BY u),
pr AS (
    SELECT cc.node, cc.cluster_id, d.{priority_col} AS prio
    FROM cc JOIN documents d ON d.doc_id = cc.node
),
rk AS (
    SELECT node, ROW_NUMBER() OVER (
        PARTITION BY cluster_id ORDER BY prio DESC, node) AS rn
    FROM pr
)
SELECT d.doc_id FROM documents d
WHERE d.doc_id NOT IN (SELECT node FROM rk WHERE rn > 1)"""


def transcripts_source(parquet_path: str) -> str:
    return f"SELECT * FROM read_parquet('{parquet_path}')"


def langid_sql() -> str:
    """Stopword-vote language ID over the ``documents`` view — the same
    occurrence-counting argmax as ops/textstats.langid_batch: words are
    [a-z]+ runs of the lowercased text, each language's vote is the
    number of word occurrences in its stopword list, prediction is the
    first-declared language with the max vote ('und' when all zero)."""
    from .ops.textstats import STOPWORDS

    langs = list(STOPWORDS)
    votes = ", ".join(
        "count(*) FILTER (WHERE w.w IN ({})) AS v_{}".format(
            ", ".join(f"'{s}'" for s in sorted(STOPWORDS[lang])), lang
        )
        for lang in langs
    )
    greatest = "greatest({})".format(", ".join(f"v_{l}" for l in langs))
    # argmax with first-declared tie-break: en >= es AND en >= pt -> en, ...
    case = f"CASE WHEN {greatest} = 0 THEN 'und'"
    for i, lang in enumerate(langs):
        if i == len(langs) - 1:
            case += f" ELSE '{lang}' END"
        else:
            conds = " AND ".join(f"v_{lang} >= v_{o}" for o in langs[i + 1:])
            case += f" WHEN {conds} THEN '{lang}'"
    return f"""
WITH w AS (
    SELECT doc_id,
           unnest(regexp_extract_all(lower(coalesce(text, '')), '[a-z]+')) AS w
    FROM documents
), v AS (
    SELECT d.doc_id, {votes}
    FROM documents d LEFT JOIN w ON w.doc_id = d.doc_id
    GROUP BY d.doc_id
)
SELECT doc_id, {case} AS lang_pred FROM v"""


def asof_click_purchase_sql() -> str:
    """As-of join over the ``events`` view: for each click, the latest
    purchase by the same user with ts <= click ts; ties on purchase ts
    break to the greatest purchase event_id (the engine's tie_col)."""
    return """
WITH c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
m AS (
    SELECT c.event_id, max(p.ts) AS asof_ts
    FROM c JOIN p ON p.user_id = c.user_id AND p.ts <= c.ts
    GROUP BY c.event_id
)
SELECT m.event_id, m.asof_ts, max(p.event_id) AS asof_event_id
FROM m
JOIN c ON c.event_id = m.event_id
JOIN p ON p.user_id = c.user_id AND p.ts = m.asof_ts
GROUP BY m.event_id, m.asof_ts"""


def range_join_click_purchase_sql(hours: int = 24) -> str:
    """Range join over the ``events`` view: (click, purchase) pairs of
    the same user where the click falls in the half-open window
    [purchase ts, purchase ts + ``hours``h)."""
    return f"""
SELECT c.event_id AS click_id, p.event_id AS purchase_id
FROM events c JOIN events p ON c.user_id = p.user_id
WHERE c.event_type = 'click' AND p.event_type = 'purchase'
  AND c.ts >= p.ts AND c.ts < p.ts + INTERVAL {hours} HOUR"""


def prepare_training_counts_sql(
    quality_min: float = 0.3, near_dup: bool = False
) -> str:
    """DuckDB replay of pipelines/prepare.prepare_training_data over the
    ``documents`` view: exact dedup (min doc_id per text) -> quality
    score (same rounded-ratio arithmetic as ops/textstats.quality_batch)
    -> language filter (stopword votes > 0) -> BPE-ish token count ->
    knuth hash split -> per-split (n_docs, total_tokens)."""
    from .ops.textstats import RE_TOKEN, STOPWORDS

    def in_list(words):
        return ", ".join(f"'{w}'" for w in sorted(words))

    all_stop = STOPWORDS["en"] | STOPWORDS["es"] | STOPWORDS["pt"]
    votes = ", ".join(
        f"count(*) FILTER (WHERE w.w IN ({in_list(STOPWORDS[lang])})) AS v_{lang}"
        for lang in STOPWORDS
    )
    nd_ctes = ""
    nd_filter = ""
    if near_dup:
        # near-dup cluster removal: the same recursive-CTE component
        # labeling as dedup_clusters_sql, dropping non-canonical nodes
        nd_ctes = f"""{_jaccard_pairs_ctes(0.8, 3)},
e AS (
    SELECT id_a AS u, id_b AS v FROM vp
    UNION SELECT id_b, id_a FROM vp
),
reach(u, r) AS (
    SELECT u, u FROM (SELECT DISTINCT u FROM e)
    UNION
    SELECT e.u, reach.r FROM e JOIN reach ON e.v = reach.u
),
cc AS (SELECT u AS node, min(r) AS cluster_id FROM reach GROUP BY u),
nd_drop AS (SELECT node FROM cc WHERE cluster_id < node),
"""
        nd_filter = " AND doc_id NOT IN (SELECT node FROM nd_drop)"
    return f"""
WITH RECURSIVE {nd_ctes}kept AS (
    SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text
), d AS (
    SELECT doc_id, text FROM documents
    WHERE doc_id IN (SELECT doc_id FROM kept){nd_filter}
), w AS (
    SELECT doc_id,
           unnest(regexp_extract_all(lower(coalesce(text, '')), '[a-z]+')) AS w
    FROM d
), v AS (
    SELECT d.doc_id,
           count(*) FILTER (WHERE w.w IN ({in_list(all_stop)})) AS n_stop,
           {votes}
    FROM d LEFT JOIN w ON w.doc_id = d.doc_id
    GROUP BY d.doc_id
), q AS (
    SELECT d.doc_id,
           LENGTH(d.text) AS n_chars,
           len(regexp_extract_all(d.text, '\\S+')) AS n_words,
           len(regexp_extract_all(d.text, '[^\\w\\s]')) AS n_punct,
           len(regexp_extract_all(d.text, '{RE_TOKEN}')) AS n_tokens,
           v.n_stop, v.v_en, v.v_es, v.v_pt
    FROM d JOIN v USING (doc_id)
), sc AS (
    SELECT doc_id, n_tokens, v_en, v_es, v_pt,
           ROUND((
               least(n_words, 100) / 100.0
               + (1 - least(ROUND(n_punct / greatest(n_chars, 1), 6), 0.5) * 2)
               + least(ROUND(n_stop / greatest(n_words, 1), 6), 0.5) * 2
           ) / 3, 6) AS quality
    FROM q
)
SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
FROM (
    SELECT CASE WHEN b < 800 THEN 'train' WHEN b < 900 THEN 'val'
                ELSE 'test' END AS split, n_tokens
    FROM (
        SELECT doc_id, n_tokens,
               ((doc_id * 2654435761) % 4294967296) % 1000 AS b
        FROM sc
        WHERE quality >= {quality_min} AND greatest(v_en, v_es, v_pt) > 0
    )
)
GROUP BY split"""
