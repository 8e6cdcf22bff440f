"""Log-file discovery -> partition manifest.

Dataset-level analog of update_available_log_files
(/root/reference/libs/lib_database.py:65-98): a listing of candidate
paths becomes manifest rows with derived (server, date, name, status)
columns. The reference's per-file ORM insert loop becomes one
map_batches pass; its insert-if-absent dedup (D1) becomes a broadcast
anti-join against the existing manifest's keys; its presence gate (F1)
becomes a status route to a kept ``rejected`` side-output instead of a
silent drop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray

import ray.data

from . import dates, routing, status, validity

# Status for rows whose server or date could not be derived (the
# reference only log-warns and skips; we keep them for audit).
REJECTED = -99


class DeriveMetadata:
    """Actor-pool stage: path -> (server, date, name, status).

    Stateful so the broadcast set of already-known manifest keys is
    fetched from the object store once per actor, not per batch.
    """

    def __init__(self, collection: str, existing_keys_ref=None):
        self.collection = collection
        self.existing = (
            ray.get(existing_keys_ref) if existing_keys_ref is not None else frozenset()
        )

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        paths = batch["path"].astype(object)
        server = routing.extract_server(paths, self.collection)
        date = dates.extract_date(paths)
        present = (server != "") & (date != "")
        valid = validity.is_valid(self.collection, paths, server, date)

        st = np.where(
            ~present.to_numpy(),
            REJECTED,
            np.where(valid.to_numpy(), status.FILE_QUEUE, status.FILE_INVALID),
        ).astype(np.int8)

        out = pd.DataFrame(
            {
                "partition_id": paths.to_numpy(dtype=object),
                "path": paths.to_numpy(dtype=object),
                "size": batch["size"].to_numpy()
                if "size" in batch.columns
                else np.zeros(len(batch), dtype=np.int64),
                # st_ctime -> created_at, per the reference's registry
                # (lib_database.py:79-80); 0 when the listing source
                # carries no stat metadata
                "created_at": batch["created_at"].to_numpy(dtype=np.int64)
                if "created_at" in batch.columns
                else np.zeros(len(batch), dtype=np.int64),
                "server": server.to_numpy(dtype=object),
                "date": date.to_numpy(dtype=object),
                "name": routing.make_name(server, date).to_numpy(dtype=object),
                "status": st,
                "collection": self.collection,
            }
        )
        if self.existing:
            out = out[~out["path"].isin(self.existing)]
        return out


def build_manifest(
    listing: "ray.data.Dataset",
    collection: str,
    existing_manifest: "ray.data.Dataset | None" = None,
    concurrency: int | tuple = (1, 4),
) -> "ray.data.Dataset":
    """listing(path[, size]) -> manifest rows (schemas.MANIFEST columns).

    The actor pool autoscales from 1 (a FIXED pool >= cluster CPUs
    would starve the upstream read task and deadlock the streaming
    executor — seen live at num_cpus=4 with concurrency=4).

    ``existing_manifest`` provides the dedup key set; it is assumed SMALL
    relative to the data (it is a per-file registry — ~1 row per input
    file), so its keys are broadcast once via ray.put. Rerunning
    discovery is idempotent: known paths are skipped (D1 semantics).
    """
    existing_ref = None
    if existing_manifest is not None:
        keys = set()
        for b in existing_manifest.select_columns(["path"]).iter_batches(
            batch_format="pandas"
        ):
            keys.update(b["path"].tolist())
        existing_ref = ray.put(frozenset(keys))

    return listing.map_batches(
        DeriveMetadata,
        fn_constructor_kwargs={
            "collection": collection,
            "existing_keys_ref": existing_ref,
        },
        batch_format="pandas",
        concurrency=concurrency,
    )
