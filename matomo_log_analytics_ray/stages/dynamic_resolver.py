"""DynamicResolver analog: first-seen site-id allocation.

import_logs.py's DynamicResolver asks the Matomo API for the site id of
each unseen host and caches the answer for the rest of the run (public
Matomo behavior; the reference drives it via the load step,
/root/reference/README.md:40-46, SURVEY.md J4). The Ray-native analog
needs ONE piece of shared mutable state — the host -> id registry —
which is exactly the case the Dataset API cannot express, so it is the
one deliberate raw-@ray.remote actor in this engine:

* ``SiteRegistry`` — a detached-free, single actor holding the dict;
  ids are allocated first-seen, contiguously from ``start_id``.
* ``DynamicSiteResolver`` — the map_batches actor-pool stage. Per
  batch it looks hosts up in its LOCAL cache first and makes at most
  ONE registry round-trip for the batch's unseen hosts (set difference
  — never a per-row call), then appends a ``site_id`` column.

Semantics and scale notes:
* id assignment is deterministic given arrival order of distinct
  hosts, and stable within a run; across runs the order (hence ids)
  can differ with scheduling — persist the registry's snapshot()
  if stable ids across runs are required.
* the registry sees each distinct host at most once per resolver
  actor; traffic is O(distinct hosts x pool size), independent of rows.
"""

from __future__ import annotations

import pandas as pd
import ray


@ray.remote(num_cpus=0)
class SiteRegistry:
    """Shared host -> site-id index (the single mutable-state actor)."""

    def __init__(self, start_id: int = 1, seed: dict | None = None):
        self._ids: dict[str, int] = dict(seed or {})
        self._next = max([start_id - 1, *self._ids.values()]) + 1 if self._ids else start_id

    def get_or_assign(self, hosts: list[str]) -> dict[str, int]:
        out = {}
        for h in hosts:
            if h not in self._ids:
                self._ids[h] = self._next
                self._next += 1
            out[h] = self._ids[h]
        return out

    def snapshot(self) -> dict[str, int]:
        return dict(self._ids)


class DynamicSiteResolver:
    """map_batches stage: append ``site_id`` resolved via the registry.

    Local cache per actor; one registry call per batch for unseen
    hosts only (a batch with no new hosts makes zero remote calls).
    """

    def __init__(self, registry: "ray.actor.ActorHandle", host_col: str = "vhost"):
        self.registry = registry
        self.host_col = host_col
        self.cache: dict[str, int] = {}

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        hosts = batch[self.host_col].fillna("").astype(object)
        distinct = set(hosts.unique())
        distinct.discard("")
        unseen = sorted(distinct - self.cache.keys())
        if unseen:
            self.cache.update(ray.get(self.registry.get_or_assign.remote(unseen)))
        out = batch.copy()
        out["site_id"] = (
            hosts.map(self.cache).astype("float64").astype("Int64")
        )
        return out


def resolve_site_ids(
    ds: "ray.data.Dataset",
    host_col: str = "vhost",
    concurrency: tuple = (1, 4),
    start_id: int = 1,
    seed: dict | None = None,
):
    """Attach first-seen site ids to ``ds``; returns (dataset, registry).

    The registry handle outlives the pipeline so callers can persist
    ``ray.get(registry.snapshot.remote())`` as the durable host map.
    """
    registry = SiteRegistry.remote(start_id=start_id, seed=seed)
    out = ds.map_batches(
        DynamicSiteResolver,
        fn_constructor_kwargs={"registry": registry, "host_col": host_col},
        batch_format="pandas",
        concurrency=concurrency,
    )
    return out, registry
