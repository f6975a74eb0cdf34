"""End-to-end pipelines: flagship extract, the generation-synchronous
crawl loop, and the training-data pipelines (dedup / text analysis /
similarity search)."""


def pool_size(frac: float = 0.4, cap: int = 8) -> int:
    """Actor-pool size that leaves CPU headroom for the task-pool stages
    downstream (an actor pool that reserves every CPU starves the
    read/groupby stages and the pipeline deadlocks at small cpu counts)."""
    try:
        import ray
        cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    except Exception:
        cpus = 4
    return max(1, min(cap, int(cpus * frac)))
