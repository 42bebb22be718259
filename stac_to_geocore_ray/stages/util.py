"""Shared stage utilities."""

from __future__ import annotations


def default_pool_size(fraction: float = 0.25, floor: int = 1) -> int:
    """Actor-pool size that cannot starve the rest of the pipeline.

    A fixed-size actor pool RESERVES its CPUs for the whole run; two
    pools that together cover every core leave nothing for the read /
    write / shuffle tasks and the streaming executor deadlocks
    (observed on this Ray version with 4+4 pools on 8 CPUs).  Cap each
    pool at ``fraction`` of the session's CPUs.
    """
    try:
        import ray
        cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    except Exception:
        cpus = 4
    return max(floor, int(cpus * fraction))
