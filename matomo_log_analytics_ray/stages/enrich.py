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
import pyarrow.compute as pc
import ray

NUM_SITE_SHARDS = 4  # must stay a power of two (shard = digits & (N-1))

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


def resolve_sinks_arrow(batch: pa.Table, tool_sinks: dict) -> pa.Table:
    """Zero-copy Arrow sink resolution: dictionary lookup via index_in +
    take, numeric shard via extract_regex + bitwise-and (power-of-two
    shard count), no pandas conversion in the hot path."""
    keys = pa.array(list(tool_sinks.keys()), pa.string())
    vals = pa.array(list(tool_sinks.values()), pa.string())
    idx = pc.index_in(batch["tool"], value_set=keys)
    mapped = pc.take(vals, idx)  # null where tool unknown/empty

    digits = pc.extract_regex(batch["conv_id"], r"(?P<d>[0-9]+)")
    dnum = pc.cast(pc.struct_field(digits, "d"), pa.int64())
    dnum = pc.coalesce(dnum, pa.scalar(0, pa.int64()))
    shard_num = pc.bit_wise_and(dnum, NUM_SITE_SHARDS - 1)
    shard = pc.binary_join_element_wise(
        pa.scalar("site-"), pc.cast(shard_num, pa.string()), ""
    )

    sink = pc.coalesce(
        mapped, pc.if_else(pc.equal(batch["role"], "system"), "system", shard)
    )
    return batch.append_column("sink", pc.cast(sink, pa.string()))


def make_sink_resolver(tool_sinks: dict | None = None):
    """Stateless map_batches fn with the (tiny) lookup table captured in
    the closure — broadcast once with the task definition, fused with
    the adjacent parse/classify task stages (no actor-pool spin-up).
    Use the SinkResolver actor class instead when the lookup state is
    large or expensive to build."""
    sinks = dict(tool_sinks or DEFAULT_TOOL_SINKS)

    def resolve(batch: pa.Table) -> pa.Table:
        return resolve_sinks_arrow(batch, sinks)

    return resolve


class SinkResolver:
    """map_batches callable class -> actor pool, for when the resolver
    state is heavy (e.g. a large host->site index fetched from the
    object store once per actor). ``tool_sinks_ref`` may be a plain
    dict (tests) or a ray.put ref.
    """

    def __init__(self, tool_sinks_ref=None):
        if tool_sinks_ref is None:
            self.tool_sinks = dict(DEFAULT_TOOL_SINKS)
        elif isinstance(tool_sinks_ref, ray.ObjectRef):
            self.tool_sinks = dict(ray.get(tool_sinks_ref))
        else:
            self.tool_sinks = dict(tool_sinks_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return resolve_sinks_arrow(batch, self.tool_sinks)
