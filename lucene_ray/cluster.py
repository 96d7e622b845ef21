"""Cluster-derived sizing for actor-pool stages.

Corpus-wide ``map_batches`` actor stages must not hardcode a pool size:
``concurrency=2`` is correct on a 4-cpu test session and starves a
32-cpu node (or a 256-node cluster) by 16×+. Every such stage sizes its
pool from ``ray.cluster_resources()`` at call time via :func:`actor_pool`.

An AUTOSCALING ``(min, max)`` pool (Ray Data's tuple form of
``concurrency``) is deliberate: the correctness gate and unit tests run
these pipelines over a few hundred rows where a fleet of actors would be
pure startup cost, while a 100 TB corpus queues enough blocks that the
pool scales to the cluster ceiling.
"""

from __future__ import annotations

from typing import Optional, Tuple


def cluster_cpus(default: int = 4) -> int:
    """Total CPUs Ray knows about (driver-side snapshot; on a multi-node
    cluster this is the whole cluster, which is what a corpus-wide stage
    should size against)."""
    try:
        import ray

        if ray.is_initialized():
            return int(ray.cluster_resources().get("CPU", default))
    except Exception:
        pass
    return default


def actor_pool(
    per_actor_cpus: float = 1.0,
    cap: Optional[int] = None,
    reserve: int = 2,
    min_actors: int = 1,
) -> Tuple[int, int]:
    """→ ``(min, max)`` concurrency tuple for a corpus-wide actor stage.

    ``max`` = (cluster CPUs − ``reserve``) / ``per_actor_cpus``, optionally
    capped (memory-bound stages pass ``cap``); ``reserve`` leaves headroom
    for the read/shuffle tasks feeding the pool. ``min`` stays small so
    short inputs don't pay actor spin-up they can't amortize.
    """
    hi = int((cluster_cpus() - reserve) // max(per_actor_cpus, 0.01))
    hi = max(min_actors, 1, hi)
    if cap is not None:
        hi = min(hi, cap)
    lo = min(max(1, min_actors), hi)
    return (lo, hi)
