"""Lookup enrichment: resolve every turn to a routing sink.

Actor-pool analog of import_logs.py's StaticResolver/DynamicResolver
(site resolution; SURVEY.md J4) and of the reference's broadcast
substring-lookup routing (/root/reference/libs/lib_file_name.py:48-70):
the sink map is loaded ONCE per actor in __init__ (broadcast via
ray.put when large), and each batch is resolved with vectorized
kernels — never a shuffle join.

Sink semantics (fixed; identical in the DuckDB oracle SQL):
  1. tool != ''     -> sink from the tool->sink lookup table
  2. role == 'system' -> 'system'
  3. otherwise      -> 'site-<digits(conv_id) % NUM_SITE_SHARDS>'
The numeric shard is derived from the conv_id digits (not a runtime
hash) so the mapping is stable across engines and processes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

NUM_SITE_SHARDS = 4

DEFAULT_TOOL_SINKS = {
    "search": "tool-search",
    "browser": "tool-browser",
    "bash": "tool-bash",
    "python": "tool-python",
}


def resolve_sinks(
    conv_id: pd.Series, role: pd.Series, tool: pd.Series, tool_sinks: dict
) -> pd.Series:
    """Vectorized sink resolution (pandas in, pandas out)."""
    tool = tool.astype(object).fillna("")
    mapped = tool.map(tool_sinks)
    has_tool = (tool != "") & mapped.notna()
    digits = (
        conv_id.str.extract(r"([0-9]+)", expand=False).fillna("0").astype(np.int64)
    )
    shard = "site-" + (digits % NUM_SITE_SHARDS).astype(str)
    out = np.where(
        has_tool.to_numpy(),
        mapped.to_numpy(dtype=object),
        np.where((role == "system").to_numpy(), "system", shard.to_numpy(dtype=object)),
    )
    return pd.Series(out, index=conv_id.index, dtype=object)


class SinkResolver:
    """map_batches callable class -> actor pool.

    ``tool_sinks_ref`` may be a plain dict (tests) or an object-store
    ref (ray.put once on the driver; each actor fetches once).
    """

    def __init__(self, tool_sinks_ref=None):
        if tool_sinks_ref is None:
            self.tool_sinks = dict(DEFAULT_TOOL_SINKS)
        elif isinstance(tool_sinks_ref, ray.ObjectRef):
            self.tool_sinks = dict(ray.get(tool_sinks_ref))
        else:
            self.tool_sinks = dict(tool_sinks_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        df = batch.select(["conv_id", "role", "tool"]).to_pandas()
        sink = resolve_sinks(df["conv_id"], df["role"], df["tool"], self.tool_sinks)
        return batch.append_column("sink", pa.array(sink.to_numpy(object), pa.string()))
