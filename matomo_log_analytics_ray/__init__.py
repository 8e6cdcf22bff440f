"""Ray-Data-native log/telemetry processing engine.

A from-scratch reimplementation of the capabilities of
pitangainnovare/matomo-log-analytics (reference snapshot at
/root/reference) as a streaming parse -> enrich -> route -> aggregate
pipeline over Parquet tables of multi-turn agent transcripts, built on
ray.data.Dataset / map_batches over zero-copy Arrow batches.

Layout:
  control/    control-plane semantics of the reference (routing-key
              extraction, date extraction, validity predicates, status
              lattices, summary parsing, manifest discovery, work queue)
              re-expressed as vectorized kernels over Arrow/pandas columns.
  stages/     data-plane batch transforms (grok/regex parse, outcome
              classification, lookup enrichment, fan-out routing,
              counter aggregation).
  pipelines/  end-to-end pipelines (flagship streaming run, checkpointed
              resumable run).
  ops/        large-scale training-data operators (dedup families,
              similarity search, text analysis, multimodal stubs).
"""

__version__ = "0.1.0"

# Importing the package anywhere (driver or worker) installs the
# pandas-block schema-metadata shim — see io.install_schema_metadata_shim.
from . import io as _io  # noqa: E402,F401
