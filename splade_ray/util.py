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


def sample_window(ds, key: str, skip: int, limit: int):
    """S3 sample window (reference ``base.py:268-279``: dataset slice
    [skip, skip+limit)) as a first-class projection over a DETERMINISTIC
    order: sort by ``key``, truncate to the first skip+limit rows with the
    streaming ``limit`` operator (only that prefix ever materializes), then
    drop the first ``skip`` with an order-preserving ``split_at_indices``.
    Row-position semantics over an unordered distributed dataset require
    the explicit sort key — there is no hidden "input order"."""
    head = ds.sort(key).limit(skip + limit)
    if skip <= 0:
        return head
    return head.split_at_indices([skip])[1]
