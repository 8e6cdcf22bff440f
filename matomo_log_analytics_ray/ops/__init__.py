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
