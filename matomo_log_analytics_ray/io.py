"""Parquet read helper: ``ray.data.read_parquet`` with footer
metadata stripped.

Why this exists: parquet files written by pandas/pyarrow carry a
``b'pandas'`` footer-metadata entry whose decoded value is a dict.
On this pyarrow version, ``hash(pa.Schema)`` raises ``unhashable
type: 'dict'`` whenever schema metadata is present, which defeats
Ray Data's schema-deduplication fast path in ``unify_schemas``
(ray/data/_internal/arrow_ops/transform_pyarrow.py) — every block
unify in every downstream shuffle/join then pays the full
field-by-field unify and logs a
"Failed to hash the schemas (for deduplication)" warning.

Passing an explicit metadata-free schema to ``read_parquet`` makes
the read emit clean, hashable block schemas, so every downstream
operator gets the early-exit schema dedup.  The footer read is one
driver-side metadata fetch per distinct path, cached for the
process lifetime.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

_SCHEMA_CACHE: dict[str, "pa.Schema"] = {}

_SHIM_INSTALLED = False


def install_schema_metadata_shim() -> None:
    """Compat shim for a Ray↔pyarrow incompatibility on this pinned
    pair: ``pa.Table.from_pandas`` (which Ray's PandasBlockAccessor
    uses to convert pandas blocks for shuffles/joins) attaches the
    b'pandas' schema metadata whose decoded value is a dict, and
    ``hash(pa.Schema)`` raises ``unhashable type: 'dict'`` on any
    schema with metadata — so every pandas-origin block defeats
    Ray's schema-dedup fast path (``unify_schemas``) and spams
    "Failed to hash the schemas (for deduplication)" in shuffle
    aggregators.  The shim strips schema metadata at the single
    pandas→Arrow conversion point (``replace_schema_metadata(None)``
    is metadata-only — zero data copy).  Idempotent; installed at
    import time in every process that imports this package — the
    driver directly, Ray workers when they unpickle any map_batches
    closure from this package (unpickling imports the defining
    module, which runs the module-level call below).

    Deliberately NOT wired as a ``worker_process_setup_hook``: the
    hook is unpickled at worker SPAWN, before the job's sys.path is
    applied, so a module-level hook function raises
    ModuleNotFoundError in every worker (observed live) — and a
    wedged setup hook can hang ``ray.init`` entirely.
    """
    global _SHIM_INSTALLED
    if _SHIM_INSTALLED:
        return
    try:
        from ray.data._internal.pandas_block import PandasBlockAccessor

        if getattr(PandasBlockAccessor.to_arrow, "_mla_shim", False):
            _SHIM_INSTALLED = True
            return
        orig = PandasBlockAccessor.to_arrow

        def to_arrow(self):
            t = orig(self)
            if t.schema.metadata:
                t = t.replace_schema_metadata(None)
            return t

        to_arrow._mla_shim = True
        PandasBlockAccessor.to_arrow = to_arrow
        _SHIM_INSTALLED = True
    except Exception:
        # Ray layout changed: the shim is an optimization, not a
        # correctness requirement — reads still pin clean schemas.
        pass


install_schema_metadata_shim()

_EMPTY_BUNDLE_SHIM_INSTALLED = False


def install_empty_bundle_schema_shim() -> None:
    """Driver-side shim: a ZERO-ROW RefBundle with an empty/None schema
    silently adopts the operator's established schema instead of
    triggering "produced a RefBundle with a different schema".

    Why: Ray's map operators never invoke the UDF on a zero-row input
    block — they emit a schema-less empty block — and sort/aggregate
    exchanges emit ``pa.table({})`` for empty range partitions (e.g.
    when Zipf-skewed boundary samples repeat). Ray's own divergence
    handler already re-tags such bundles with the old schema; it just
    warns first and marks the stream diverged, which disables schema
    dedup for the rest of the plan. Adopting the old schema for a
    bundle that provably carries NO rows is strictly more correct —
    non-empty or genuinely conflicting schemas still take Ray's
    original path. Runs only in the driver (the streaming executor
    lives there), so module-level installation fully covers it.
    """
    global _EMPTY_BUNDLE_SHIM_INSTALLED
    if _EMPTY_BUNDLE_SHIM_INSTALLED:
        return
    try:
        from ray.data._internal.execution import (
            streaming_executor_state as _ses,
        )
        from ray.data._internal.execution.interfaces import RefBundle
        from ray.data.block import _is_empty_schema

        if getattr(_ses.dedupe_schemas_with_validation, "_mla_shim", False):
            _EMPTY_BUNDLE_SHIM_INSTALLED = True
            return
        orig = _ses.dedupe_schemas_with_validation

        def dedupe(old_schema, bundle, warn=True, enforce_schemas=False):
            if (
                not _is_empty_schema(old_schema)
                and _is_empty_schema(bundle.schema)
                and bundle.num_rows() == 0
            ):
                return (
                    RefBundle(
                        bundle.blocks,
                        schema=old_schema,
                        owns_blocks=bundle.owns_blocks,
                        output_split_idx=bundle.output_split_idx,
                        _cached_object_meta=bundle._cached_object_meta,
                        _cached_preferred_locations=(
                            bundle._cached_preferred_locations
                        ),
                    ),
                    False,
                )
            return orig(
                old_schema, bundle, warn=warn, enforce_schemas=enforce_schemas
            )

        dedupe._mla_shim = True
        _ses.dedupe_schemas_with_validation = dedupe
        _EMPTY_BUNDLE_SHIM_INSTALLED = True
    except Exception:
        # Ray layout changed: fall back to Ray's own divergence path
        # (warning + old-schema re-tag) — cosmetic, not correctness.
        pass


install_empty_bundle_schema_shim()


def _clean_schema(path) -> "pa.Schema | None":
    """Metadata-free schema for ``path`` (first path if a list), or
    None when the footer can't be read cheaply (directories, globs —
    Ray resolves those itself and the warning path is harmless
    there)."""
    if isinstance(path, (list, tuple)):
        if not path:
            return None
        path = path[0]
    if not isinstance(path, str):
        return None
    sch = _SCHEMA_CACHE.get(path)
    if sch is None:
        try:
            sch = pq.read_schema(path).remove_metadata()
        except Exception:
            return None
        _SCHEMA_CACHE[path] = sch
    return sch


def read_parquet(path, **kwargs) -> "ray.data.Dataset":
    """Drop-in ``ray.data.read_parquet`` that pins a metadata-free
    schema (see module docstring). All kwargs pass through.

    Schema pinning is skipped when a ``filter`` is given: the filter
    expression may reference columns outside the projection, and
    binding it against a schema narrowed to ``columns`` fails at the
    fragment scan ("No match for FieldRef", seen live on the
    range-join read)."""
    if "schema" not in kwargs and kwargs.get("filter") is None:
        sch = _clean_schema(path)
        if sch is not None:
            cols = kwargs.get("columns")
            if cols is not None:
                # Ray validates the produced (already-projected)
                # batches against the given schema — project it to
                # the selected columns, in selection order.
                try:
                    sch = pa.schema([sch.field(c) for c in cols])
                except KeyError:
                    sch = None
            if sch is not None:
                kwargs["schema"] = sch
    return ray.data.read_parquet(path, **kwargs)
