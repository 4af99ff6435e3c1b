"""Shared execution-sizing helpers."""

from __future__ import annotations

import ray


def pool_size(reserve: int = 2, fraction: float = 0.75) -> int:
    """Actor-pool size that leaves headroom for the read/write/shuffle
    stages sharing the cluster — a pool that reserves every CPU starves the
    upstream tasks and can stall the pipeline outright (observed: a
    concurrency=4 pool on a 4-CPU cluster deadlocks the read)."""
    try:
        ncpu = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        ncpu = 4
    return max(1, min(ncpu - reserve, int(ncpu * fraction)))
