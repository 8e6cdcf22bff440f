"""Large-scale training-data operators: dedup families, similarity
search, text analysis, multimodal plumbing."""


def default_join_partitions() -> int:
    """Hash-join/shuffle partition default: cluster CPUs - 2. Too few
    partitions serialize the probe-side hash tables (8 partitions took
    >10 min on a 20M-row self-join that 32 finished in 38 s); more
    partitions than CPUs starve the streaming executor under small
    sessions (NOTES_ROUND1 fixed-pool deadlock). One definition —
    cluster.py / prepare.py / asof.py / textstats.py all share it."""
    import ray

    return max(2, int(ray.cluster_resources().get("CPU", 8)) - 2)


def drop_empty_blocks(ds):
    """Rebuild a MATERIALIZED dataset's block list without zero-row
    blocks, moving no data (block refs are reused; only metadata is
    read on the driver).

    Why: Ray's map operators never invoke the UDF on a zero-row block —
    they emit a schema-less empty block instead — so one empty block in
    a materialized intermediate (e.g. a filter stage that matched
    nothing in that block) poisons every downstream stage's schema
    dedup with "produced a RefBundle with a different schema" warnings.
    Cost is O(num_blocks) driver metadata, zero object-store traffic —
    safe at any data scale."""
    import ray.data

    refs = []
    saw_empty = False
    for bundle in ds.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            if meta.num_rows:
                refs.append(ref)
            else:
                saw_empty = True
    if not saw_empty or not refs:
        # nothing to drop, or ALL blocks empty (keep the typed empties:
        # downstream count()==0 short-circuits handle that case)
        return ds
    import pyarrow as pa

    if isinstance(ds.schema().base_schema, pa.Schema):
        return ray.data.from_arrow_refs(refs)
    return ray.data.from_pandas_refs(refs)
