"""Outcome classification over parsed turns.

One ``outcome`` enum column per turn — the engine's analog of
import_logs.py's hit filters, whose taxonomy survives in the reference
as the six ignored_lines_* counter columns
(/root/reference/models/declarative.py:37-42) and the summary counters
(/root/reference/libs/lib_summary.py:10-20). Deriving EVERY counter as
a groupby over this single column guarantees counter-vs-routed-row
equality by construction (SURVEY.md F5).

Canonical precedence (fixed; identical in the DuckDB oracle SQL):
  1. invalid        fmt is null (no format matched)
  2. filtered       path starts with an excluded prefix
  3. static         path ends with a static-resource extension
  4. bot            user agent matches the bot pattern
  5. http_redirect  300 <= status < 400
  6. http_error     status >= 400
  7. imported       everything else
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# RE2-compatible; shared verbatim with the DuckDB oracle.
RE_BOT_AGENT = r"(?i)(bot|crawler|spider|slurp|curl|wget)"
RE_STATIC_PATH = r"\.(css|js|png|gif|jpg|jpeg|ico|svg|woff2?|ttf)(\?.*)?$"
EXCLUDED_PREFIXES = ("/admin", "/internal")


def classify_batch(batch: pa.Table) -> pa.Table:
    """Append the ``outcome`` column. Vectorized pyarrow kernels only."""
    n = len(batch)
    fmt = batch["fmt"]
    path = batch["path"]
    # agent may be null on formats without a UA field (common/common_vhost)
    # even when fmt matched; arrow's and_ is non-Kleene, so a null agent
    # would poison the whole nested if_else -> coalesce to ''.
    agent = pc.coalesce(batch["user_agent"], pa.scalar("", pa.string()))
    status = batch["http_status"]

    false = pa.array([False] * n, pa.bool_())
    path_ok = pc.is_valid(path)
    filtered = false
    for prefix in EXCLUDED_PREFIXES:
        filtered = pc.or_(
            filtered, pc.and_(path_ok, pc.starts_with(path, prefix))
        )
    static = pc.and_(path_ok, pc.match_substring_regex(path, RE_STATIC_PATH))
    bot = pc.and_(pc.is_valid(agent), pc.match_substring_regex(agent, RE_BOT_AGENT))
    st_ok = pc.is_valid(status)
    redirect = pc.and_(st_ok, pc.and_(pc.greater_equal(status, 300), pc.less(status, 400)))
    error = pc.and_(st_ok, pc.greater_equal(status, 400))

    outcome = pc.if_else(
        pc.is_null(fmt),
        "invalid",
        pc.if_else(
            filtered,
            "filtered",
            pc.if_else(
                static,
                "static",
                pc.if_else(
                    bot,
                    "bot",
                    pc.if_else(
                        redirect,
                        "http_redirect",
                        pc.if_else(error, "http_error", "imported"),
                    ),
                ),
            ),
        ),
    )
    return batch.append_column("outcome", pc.cast(outcome, pa.string()))
